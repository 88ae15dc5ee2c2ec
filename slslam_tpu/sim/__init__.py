"""Synthetic simulation harness (house line-world + wave trajectory).

Recreates the authors' unreleased simulation build (evidence: the dangling
obs_err_stddev flag at /root/reference/src/slam.cpp:23, the hard-coded
data/simulation/house/ output path at slam.cpp:1460-1463, and the
matlab_script/house.m world generator) so the engine can be validated
end-to-end against known ground truth.
"""

from .house import house_segments
from .render import StereoLineRenderer
from .street import (OutlierInjector, corridor_segments,
                     load_reference_poses, real_proxy_workload)
from .tracks import SegmentDescriptorSource, TrackIdAssigner
from .village import village_segments, village_trajectory
from .wave import wave_trajectory
