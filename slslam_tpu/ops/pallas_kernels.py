"""Pallas TPU kernels for the BA hot path.

``segment_sum_pallas`` — the normal-equation assembly primitive: given
per-observation block values (O, D) and integer target indices (O,), produce
per-target sums (P, D).  This is the reduction behind Hcc/Hll/gc/gl and the
cam-line coupling W in ops/schur_ba.

Why a kernel: XLA lowers scatter-add sequentially on TPU, and the matmul
reformulation (one_hot(idx) @ values) materializes an O x P one-hot in HBM
(50+ MB at window scale, growing linearly with map size).  Here the one-hot
tile is built on the fly in VMEM from a broadcasted iota and consumed
immediately by the MXU — zero HBM traffic beyond inputs and outputs, with
the output tile accumulated across the observation-chunk grid dimension.

Grid: (P_tiles, O_chunks); the output tile depends only on the first grid
index, so Pallas keeps it resident while the inner dimension streams
observation chunks through VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _seg_sum_kernel(idx_ref, val_ref, out_ref):
    o = pl.program_id(1)

    @pl.when(o == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    p = pl.program_id(0)
    tile_p = out_ref.shape[0]
    chunk = val_ref.shape[0]

    idx = idx_ref[:, 0]                                    # (CHUNK,)
    base = p * tile_p
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (chunk, tile_p), 1) + base
    onehot = (idx[:, None] == row_ids).astype(val_ref.dtype)
    out_ref[:] += jnp.dot(onehot.T, val_ref[:],
                          preferred_element_type=out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_segments", "tile_p", "chunk",
                                    "interpret"))
def segment_sum_pallas(values, idx, num_segments, tile_p=256, chunk=512,
                       interpret=False):
    """Per-segment sums: (O, D), (O,) int32 -> (num_segments, D).

    O must be a multiple of `chunk` (callers pad with an out-of-range index
    such as num_segments so padded rows land nowhere).  num_segments is
    padded up to a tile multiple internally.
    """
    O, D = values.shape
    assert O % chunk == 0, (O, chunk)
    P_pad = ((num_segments + tile_p - 1) // tile_p) * tile_p

    out = pl.pallas_call(
        _seg_sum_kernel,
        grid=(P_pad // tile_p, O // chunk),
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda p, o: (o, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((chunk, D), lambda p, o: (o, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_p, D), lambda p, o: (p, 0),
                               memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P_pad, D), values.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32).reshape(-1, 1), values)
    return out[:num_segments]


# Beyond this many output segments the kernel's all-pairs tile masking
# (O(O x P) dot-product work) loses to XLA's scatter lowering — measured
# crossover on v5e ~P=32k (BENCH.md).  Larger P falls back to scatter-add;
# truly large problems should use the bucketed layout of ops/schur_cg.py,
# which needs no segment-sum at all.
PAIR_SEGMENTS_LIMIT = 32768


def assemble_pallas(A, B, Wb, gc_o, gl_o, obs_cam, obs_line, C, L,
                    interpret=False):
    """Full BA assembly via the Pallas segment-sum.

    A (O,6,6), B (O,4,4), Wb (O,6,4), gc_o (O,6), gl_o (O,4) ->
    Hcc (C,6,6), Hll (L,4,4), gc (C,6), gl (L,4), W (C,L,6,4).

    The five reductions are packed into two kernel launches: camera-indexed
    quantities (A | gc_o -> 42 lanes) and pair-indexed W; line-indexed
    (B | gl_o -> 20 lanes).  The pair-indexed W reduction switches to a
    scatter-add past PAIR_SEGMENTS_LIMIT output segments.
    """
    O = A.shape[0]
    chunk = min(512, O)
    cam_vals = jnp.concatenate([A.reshape(O, 36), gc_o], axis=1)    # (O,42)
    line_vals = jnp.concatenate([B.reshape(O, 16), gl_o], axis=1)   # (O,20)

    cam_out = segment_sum_pallas(cam_vals, obs_cam, C,
                                 tile_p=min(256, _round8(C)), chunk=chunk,
                                 interpret=interpret)
    line_out = segment_sum_pallas(line_vals, obs_line, L,
                                  tile_p=min(256, _round8(L)), chunk=chunk,
                                  interpret=interpret)
    if C * L <= PAIR_SEGMENTS_LIMIT:
        pair = obs_cam * L + obs_line
        W = segment_sum_pallas(Wb.reshape(O, 24), pair, C * L, chunk=chunk,
                               interpret=interpret).reshape(C, L, 6, 4)
    else:
        W = jnp.zeros((C, L, 6, 4), Wb.dtype).at[obs_cam, obs_line].add(Wb)

    Hcc = cam_out[:, :36].reshape(C, 6, 6)
    gc = cam_out[:, 36:]
    Hll = line_out[:, :16].reshape(L, 4, 4)
    gl = line_out[:, 16:]
    return Hcc, Hll, gc, gl, W


def _round8(n):
    return max(8, ((n + 7) // 8) * 8)
