"""Jitted device kernels (the functional core)."""
