"""Front-end: observation loading, line detection/matching/description.

The reference ships no front-end ("detection, tracking and loop closure
detection modules are NOT included", /root/reference/README:31-33) — only the
line-track file replay contract.  This package provides both: a loader for
the reference's file format, and a from-scratch stereo line front-end
(detector / matcher / descriptor) for running on raw imagery.
"""

from .io import ObsFileLoader  # noqa: F401
