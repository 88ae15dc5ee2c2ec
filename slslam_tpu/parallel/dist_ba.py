"""Distributed windowed bundle adjustment.

Scaling model (SURVEY.md §5 "long-context" analog): the map-scaling axis is
the observation set.  Observations are sharded over the mesh's data axis;
each device assembles its partial normal-equation blocks (camera 6x6 blocks,
line 4x4 blocks, cam-line couplings) from its shard and the blocks are
reduced with `psum` over ICI.  The Schur-reduced camera system (6C x 6C,
small) is then solved replicated on every device — the standard
"reduce-then-redundant-solve" pattern for small reduced systems, costing one
allreduce per LM iteration and no other communication.

The whole LM loop (jax.lax.while_loop) runs inside shard_map, so a complete
distributed solve is a single XLA program with fused collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import schur_ba

AXIS = "obs"


def make_mesh(devices=None, axis_name=AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.array(devices), (axis_name,))


@functools.partial(jax.jit,
                   static_argnames=("mesh", "robust", "max_iters"))
def dist_local_ba(mesh, cam_wt, line_orth, obs, obs_cam, obs_line, obs_valid,
                  cam_free, line_free, baseline, huber_delta,
                  robust=True, max_iters=10):
    """Same contract as ops.schur_ba.local_ba, executed sharded over `mesh`.

    The observation arrays' leading dimension must be divisible by the mesh
    size (pad with obs_valid=False rows; capacity buckets are powers of two
    so this holds for any power-of-two mesh).
    """

    def inner(cam_wt, line_orth, obs, obs_cam, obs_line, obs_valid,
              cam_free, line_free, baseline, huber_delta):
        return schur_ba.local_ba_impl(
            cam_wt, line_orth, obs, obs_cam, obs_line, obs_valid,
            cam_free, line_free, baseline, huber_delta,
            robust=robust, max_iters=max_iters, axis_name=AXIS)

    sharded = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                  P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)

    return sharded(cam_wt, line_orth, obs, obs_cam, obs_line, obs_valid,
                   cam_free, line_free,
                   jnp.asarray(baseline, cam_wt.dtype),
                   jnp.asarray(huber_delta, cam_wt.dtype))
