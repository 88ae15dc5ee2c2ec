#!/bin/sh
# Build the native runtime library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -o libslslam_native.so slslam_native.cpp
echo "built $(pwd)/libslslam_native.so"
