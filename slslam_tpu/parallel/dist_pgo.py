"""Distributed pose-graph optimization: edges sharded over the mesh.

Each device evaluates residuals/Jacobians for its edge shard and assembles a
partial dense normal-equation system; one psum per LM iteration reduces them,
and the (small) 6V x 6V solve runs replicated.  See parallel.dist_ba for the
pattern rationale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops import pose_graph

AXIS = "obs"


@functools.partial(jax.jit, static_argnames=("mesh", "max_iters"))
def dist_pose_graph_opt(mesh, poses, edges_i, edges_j, constraints, e_valid,
                        pose_free, max_iters=10):
    """Same contract as ops.pose_graph.pose_graph_opt, sharded over `mesh`.

    Edge arrays' leading dimension must be divisible by the mesh size (pad
    with e_valid=False rows).
    """

    def inner(poses, ei, ej, ctr, ev, pf):
        return pose_graph.pose_graph_opt_impl(
            poses, ei, ej, ctr, ev, pf, max_iters=max_iters, axis_name=AXIS)

    sharded = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False)

    return sharded(poses, edges_i, edges_j, constraints, e_valid, pose_free)
