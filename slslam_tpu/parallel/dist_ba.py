"""Distributed windowed bundle adjustment (line-sharded).

Scaling model (SURVEY.md §5 "long-context" analog): the map-scaling axis is
the landmark/observation set.  Lines and their observations shard over the
mesh; every shard eliminates its own 4x4 line blocks, and per LM iteration
the only collectives are one psum of {cost, Hcc (C,6,6), gc (C,6)} at
evaluation and one psum of the (6C x 6C) reduced-system coupling at the
solve — **communication independent of the number of lines/observations**
(asserted from compiled HLO in tests/test_distributed.py).  The reduced
camera system is solved replicated on every device — the standard
"reduce-then-redundant-solve" pattern for small reduced systems.

An observation-sharded layout existed in round 1 but psummed the full
(C, L, 6, 4) coupling every iteration — communication growing with map
size; it was retired in favor of this one (VERDICT.md round 1, item 4).

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

def partition_by_line(line_orth, line_free, obs, obs_cam, obs_line,
                      obs_valid, n_shards):
    """Partition a BA problem by line for dist_local_ba_lines.

    Lines are dealt round-robin to shards (balances observation counts for
    typical windows); each shard receives its lines plus the observations of
    those lines, with obs_line rewritten to local indices.  All shards are
    padded to identical sizes.  Returns the stacked per-shard arrays
    (leading axis = shard) plus the line permutation needed to undo the
    reordering of the returned line array.
    """
    import numpy as np

    L = len(line_orth)
    O = len(obs)
    shard_of = np.arange(L) % n_shards
    local_of = np.arange(L) // n_shards
    Lp = (L + n_shards - 1) // n_shards

    obs_shard = shard_of[obs_line]
    obs_local = local_of[obs_line]

    counts = np.bincount(obs_shard[np.asarray(obs_valid, bool)],
                         minlength=n_shards)
    Op = max(int(counts.max()) if len(counts) else 1, 1)
    # round up for friendly tiling
    Op = int(2 ** np.ceil(np.log2(max(Op, 8))))

    lo = np.zeros((n_shards, Lp, 4), np.asarray(line_orth).dtype)
    lo[:, :, 3] = 0.5
    lf = np.zeros((n_shards, Lp), bool)
    ob = np.zeros((n_shards, Op, 8), np.asarray(obs).dtype)
    oc = np.zeros((n_shards, Op), np.int32)
    ol = np.zeros((n_shards, Op), np.int32)
    ov = np.zeros((n_shards, Op), bool)

    for s in range(n_shards):
        sel = shard_of == s
        lo[s, :sel.sum()] = np.asarray(line_orth)[sel]
        lf[s, :sel.sum()] = np.asarray(line_free)[sel]
        osel = (obs_shard == s) & np.asarray(obs_valid, bool)
        n = osel.sum()
        ob[s, :n] = np.asarray(obs)[osel]
        oc[s, :n] = np.asarray(obs_cam)[osel]
        ol[s, :n] = obs_local[osel]
        ov[s, :n] = True

    # permutation: global line i lives at (shard_of[i], local_of[i]) ->
    # flattened position shard_of[i] * Lp + local_of[i]
    perm = shard_of * Lp + local_of
    return lo, lf, ob, oc, ol, ov, perm


@functools.partial(jax.jit,
                   static_argnames=("mesh", "robust", "max_iters",
                                    "line_param"))
def dist_local_ba_lines(mesh, cam_wt, line_orth_sh, obs_sh, obs_cam_sh,
                        obs_line_sh, obs_valid_sh, cam_free, line_free_sh,
                        baseline, huber_delta, robust=True, max_iters=10,
                        line_param="orth"):
    """Line-sharded distributed BA.

    Inputs with the `_sh` suffix are stacked per-shard arrays from
    partition_by_line (leading axis = shard, consumed by the mesh).  Per LM
    iteration the only collectives are one psum of {cost, Hcc (C,6,6),
    gc (C,6)} and one psum of the (6C x 6C) reduced-system coupling —
    communication independent of map size.

    Returns (cam', line_sh' (n_shards, Lp, 4), stats).
    """
    n = mesh.devices.size

    def inner(cam_wt, lo, ob, oc, ol, ov, cf, lf, bl, hd):
        return schur_ba.local_ba_sharded_impl(
            cam_wt, lo[0], ob[0], oc[0], ol[0], ov[0], cf, lf[0], bl, hd,
            robust=robust, max_iters=max_iters, axis_name=AXIS,
            line_param=line_param)

    def reshape_out(cam, line, stats):
        return cam, line, stats

    sharded = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                  P(), P(AXIS), P(), P()),
        out_specs=(P(), P(AXIS), P()),
        check_vma=False)

    cam, line_flat, stats = sharded(
        cam_wt, line_orth_sh, obs_sh, obs_cam_sh, obs_line_sh, obs_valid_sh,
        cam_free, line_free_sh, jnp.asarray(baseline, cam_wt.dtype),
        jnp.asarray(huber_delta, cam_wt.dtype))
    Lp = line_orth_sh.shape[1]
    return cam, line_flat.reshape(n, Lp, 4), stats
