"""Metric embedding: re-root the relative map's pose field.

Port of SLAM::metric_embedding (/root/reference/src/slam.cpp:1317-1366): a
best-first traversal from the root keyframe ordered by accumulated edge
translation norm; each reached keyframe's transient pose T is assigned by
composing the edge transform onto its parent's pose at insertion time.

This is a tiny host-side graph walk (O(V log V + E) on a few hundred nodes,
microseconds) — keeping it on host is the TPU-first choice: it sequences the
device kernels rather than competing with them.
"""

from __future__ import annotations

import heapq
from typing import List, Tuple

from ..hostgeom import Pose
from .state import MapState


def metric_embedding(state: MapState, root_id: int) -> List[Tuple[float, int]]:
    """Assign kfs[k].T for every keyframe reachable from root_id.

    Returns the embedding order [(accumulated_distance, kf_id), ...] sorted
    by distance (the reference's me_map multimap).
    """
    state.kfs[root_id].T = Pose()
    heap: List[Tuple[float, int, int]] = [(0.0, 0, root_id)]
    embedded = {root_id}
    order: List[Tuple[float, int]] = []
    tiebreak = 0

    while heap:
        d, _, kid = heapq.heappop(heap)
        order.append((d, kid))
        kf = state.kfs[kid]
        T = kf.T

        for nb in sorted(kf.neighbor_kfs):
            if nb in embedded:
                continue
            edge = state.edges[(kid, nb)]
            new_T = edge.T
            new_d = float(pow(new_T.t @ new_T.t, 0.5))
            state.kfs[nb].T = new_T @ T
            embedded.add(nb)
            tiebreak += 1
            heapq.heappush(heap, (d + new_d, tiebreak, nb))

    return order
