"""Profiling stopwatch with named accumulator channels.

Replaces the reference's StopWatch (/root/reference/src/stopwatch.h, channels
used at slam.cpp:245,316,1237,1312,1384-1386): channel 1 = pose estimation,
channel 2 = local BA, channel 3 = pose-graph optimization.  Device timings
are fenced with jax.block_until_ready at the call sites.
"""

from __future__ import annotations

import time
from typing import Dict


class ChannelStats:
    __slots__ = ("total", "count")

    def __init__(self):
        self.total = 0.0
        self.count = 0

    @property
    def mean(self) -> float:
        return self.total / self.count if self.count else 0.0


class StopWatch:
    def __init__(self):
        self._start = time.perf_counter()
        self._channels: Dict[str, ChannelStats] = {}
        self._open: Dict[str, float] = {}

    def tick(self, channel: str):
        self._open[channel] = time.perf_counter()

    def tock(self, channel: str):
        t0 = self._open.pop(channel, None)
        if t0 is None:
            return
        st = self._channels.setdefault(channel, ChannelStats())
        st.total += time.perf_counter() - t0
        st.count += 1

    def stats(self, channel: str) -> ChannelStats:
        return self._channels.get(channel, ChannelStats())

    def elapsed(self) -> float:
        return time.perf_counter() - self._start
