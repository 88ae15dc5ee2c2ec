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


# ---------------------------------------------------------------------------
# Fused evaluate: residual + forward-mode Jacobians + robust weights +
# block outer products + one-hot assembly in ONE kernel (VERDICT r3 item
# 8: "a Pallas kernel where it could actually win" — the stage whose XLA
# lowering materializes r/Jc/Jl/A/B/Wb and the (O, C*L) one-hot to HBM
# between fusions).
# ---------------------------------------------------------------------------

def _resid_soa(camp, linp, obs, baseline):
    """lba_residual in structure-of-arrays form: 10 (B,) parameter vectors
    -> 4 (B,) residuals, elementwise ops only (lane-friendly; no batched
    3x3 dot_generals for Mosaic to choke on).  Mirrors
    ops/residuals.lba_residual + geometry.orth_rotation/orth_to_av/
    rodrigues exactly (same formulas, scalarized)."""
    w0, w1, w2, t0, t1, t2, la, lb, lg, lt = (
        camp[:, 0], camp[:, 1], camp[:, 2], camp[:, 3], camp[:, 4],
        camp[:, 5], linp[:, 0], linp[:, 1], linp[:, 2], linp[:, 3])
    f32 = w0.dtype

    # --- orth decode (geometry.orth_rotation / orth_to_av) ---
    s1, c1 = jnp.sin(la), jnp.cos(la)
    s2, c2 = jnp.sin(lb), jnp.cos(lb)
    s3, c3 = jnp.sin(lg), jnp.cos(lg)
    # R columns: dv = R[:,1], cp = -R[:,2] * d
    R01 = s1 * s2 * c3 - c1 * s3
    R11 = s1 * s2 * s3 + c1 * c3
    R21 = s1 * c2
    R02 = c1 * s2 * c3 + s1 * s3
    R12 = c1 * s2 * s3 - s1 * c3
    R22 = c1 * c2
    d = jnp.cos(lt) / jnp.sin(lt)
    cpx, cpy, cpz = -R02 * d, -R12 * d, -R22 * d
    dvx, dvy, dvz = R01, R11, R21

    # --- camera rotation (geometry.rodrigues, scalarized):
    # R = I + a*W + b*W^2 with W^2 = w w^T - theta^2 I ---
    th2 = w0 * w0 + w1 * w1 + w2 * w2
    th = jnp.sqrt(jnp.maximum(th2, 1e-12))
    small = th2 < 1e-16
    a = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(small, 0.5 - th2 / 24.0,
                  (1.0 - jnp.cos(th)) / jnp.maximum(th2, 1e-12))
    C00 = 1.0 + b * (w0 * w0 - th2)
    C01 = -a * w2 + b * w0 * w1
    C02 = a * w1 + b * w0 * w2
    C10 = a * w2 + b * w0 * w1
    C11 = 1.0 + b * (w1 * w1 - th2)
    C12 = -a * w0 + b * w1 * w2
    C20 = -a * w1 + b * w0 * w2
    C21 = a * w0 + b * w1 * w2
    C22 = 1.0 + b * (w2 * w2 - th2)

    pcx = C00 * cpx + C01 * cpy + C02 * cpz + t0
    pcy = C10 * cpx + C11 * cpy + C12 * cpz + t1
    pcz = C20 * cpx + C21 * cpy + C22 * cpz + t2
    dcx = C00 * dvx + C01 * dvy + C02 * dvz
    dcy = C10 * dvx + C11 * dvy + C12 * dvz
    dcz = C20 * dvx + C21 * dvy + C22 * dvz

    def seg(px, py, pz, xa, ya, xb, yb):
        nx = py * dcz - pz * dcy
        ny = pz * dcx - px * dcz
        nz = px * dcy - py * dcx
        sql = jnp.sqrt(nx * nx + ny * ny)
        inv = 1.0 / jnp.maximum(sql, 1e-12)
        nx, ny, nz = nx * inv, ny * inv, nz * inv
        ra = -(xa * nx + ya * ny + nz)
        rb = -(xb * nx + yb * ny + nz)
        return ra, rb

    r0, r1 = seg(pcx, pcy, pcz, obs[:, 0], obs[:, 1], obs[:, 2],
                 obs[:, 3])
    r2, r3 = seg(pcx - baseline, pcy, pcz, obs[:, 4], obs[:, 5],
                 obs[:, 6], obs[:, 7])
    return r0, r1, r2, r3


def _fused_common(obs, idxc, idxl, wv, cam_ref, line_ref, cfree_ref,
                  lfree_ref, baseline, huber, B, C, L):
    """Shared body: gather params, residual + Jacobian columns via ONE
    tiled jvp, robust weights, masking.  Returns (r, cols, cost_i,
    onehot_c, onehot_l)."""
    f32 = cam_ref.dtype
    onehot_c = (idxc[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (B, C), 1)).astype(f32)
    onehot_l = (idxl[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (B, L), 1)).astype(f32)
    camp = jnp.dot(onehot_c, cam_ref[:],
                   preferred_element_type=f32)         # (B, 6)
    linp = jnp.dot(onehot_l, line_ref[:],
                   preferred_element_type=f32)         # (B, 4)
    cfree_b = jnp.dot(onehot_c, cfree_ref[:],
                      preferred_element_type=f32)[:, 0]
    lfree_b = jnp.dot(onehot_l, lfree_ref[:],
                      preferred_element_type=f32)[:, 0]

    # Jacobian via ONE jvp over an 11x-tiled batch with block-basis
    # tangents: Mosaic crashes whenever the residual graph appears more
    # than once in a kernel (even primal + one jvp) AND past ~1k rows
    # per jvp, so the 10 directional derivatives ride a single jvp
    # instance over a (11*B)-row tile — block 0 carries the primal
    # (zero tangent), blocks 1..6 the camera basis, 7..10 the line
    # basis.  Same total FLOPs, one graph.  B must keep 11*B under the
    # compiler's limit (B=64 -> 704 rows: OK; 128 -> 1408: SIGABRT).
    T = 11
    campT = jnp.tile(camp, (T, 1))                     # (T*B, 6)
    linpT = jnp.tile(linp, (T, 1))
    obsT = jnp.tile(obs, (T, 1))

    def f(params):
        cp, lp = params
        return jnp.stack(_resid_soa(cp, lp, obsT, baseline), axis=1)

    blk = jax.lax.broadcasted_iota(jnp.int32, (T * B, 1), 0) // B
    c6 = jax.lax.broadcasted_iota(jnp.int32, (T * B, 6), 1)
    c4 = jax.lax.broadcasted_iota(jnp.int32, (T * B, 4), 1)
    tc = jnp.where((blk - 1) == c6, 1.0, 0.0).astype(f32)
    tl = jnp.where((blk - 7) == c4, 1.0, 0.0).astype(f32)
    r_all, jt = jax.jvp(f, ((campT, linpT),), ((tc, tl),))
    r = r_all[:B]                                      # (B, 4)
    cols = [jt[(t + 1) * B:(t + 2) * B] for t in range(10)]

    # robust Huber (ops/schur_ba._robust_weights)
    s = jnp.sum(r * r, axis=1)
    d2 = huber * huber
    out = s > d2
    safe = jnp.maximum(s, 1e-30)
    rho = jnp.where(out, 2.0 * huber * jnp.sqrt(safe) - d2, s)
    rho1 = jnp.where(out, huber / jnp.sqrt(safe), 1.0)
    w_r = jnp.sqrt(rho1)
    valid = wv > 0
    cost_i = jnp.where(valid, 0.5 * rho, 0.0)
    # NaN-proof masking (CLAUDE.md): select-zero, never multiply
    r = jnp.where(valid[:, None], r * w_r[:, None], 0.0)
    for t in range(10):
        freem = cfree_b if t < 6 else lfree_b
        cols[t] = jnp.where(valid[:, None],
                            cols[t] * (w_r * freem)[:, None], 0.0)
    return r, cols, cost_i, onehot_c, onehot_l


def _dotk(x, y):
    return jnp.sum(x * y, axis=1)


def _make_fused_camline_kernel(C, L, B):
    """Kernel 1: cost + camera blocks (Hcc|gc) + line blocks (Hll|gl),
    emitted as per-chunk PARTIALS (the in-kernel revisited-output
    accumulation pattern crashes this toolchain's Mosaic; the partial
    sum happens in XLA outside)."""

    def kernel(obs_ref, idxc_ref, idxl_ref, wv_ref, cam_ref, line_ref,
               cfree_ref, lfree_ref, scal_ref, cam_out_ref,
               line_out_ref):
        f32 = cam_ref.dtype
        r, cols, cost_i, onehot_c, onehot_l = _fused_common(
            obs_ref[:], idxc_ref[:, 0], idxl_ref[:, 0], wv_ref[:, 0],
            cam_ref, line_ref, cfree_ref, lfree_ref, scal_ref[0, 0],
            scal_ref[0, 1], B, C, L)

        Amat = jnp.stack([_dotk(cols[i], cols[j])
                          for i in range(6) for j in range(6)], axis=1)
        Bmat = jnp.stack([_dotk(cols[6 + i], cols[6 + j])
                          for i in range(4) for j in range(4)], axis=1)
        gco = jnp.stack([_dotk(cols[i], r) for i in range(6)], axis=1)
        glo = jnp.stack([_dotk(cols[6 + i], r) for i in range(4)], axis=1)

        cam_out_ref[:] = jnp.dot(onehot_c.T,
                                 jnp.concatenate([Amat, gco], axis=1),
                                 preferred_element_type=f32)[None]
        line_out_ref[:] = jnp.dot(onehot_l.T,
                                  jnp.concatenate([Bmat, glo], axis=1),
                                  preferred_element_type=f32)[None]

    return kernel


def _make_fused_w_kernel(C, L, B):
    """Kernel 2: per-chunk partials of the cam-line coupling W via the
    pair one-hot (built in VMEM, never materialized to HBM)."""
    CL = C * L

    def kernel(obs_ref, idxc_ref, idxl_ref, wv_ref, cam_ref, line_ref,
               cfree_ref, lfree_ref, scal_ref, w_out_ref):
        f32 = cam_ref.dtype
        idxc = idxc_ref[:, 0]
        idxl = idxl_ref[:, 0]
        r, cols, cost_i, onehot_c, onehot_l = _fused_common(
            obs_ref[:], idxc, idxl, wv_ref[:, 0], cam_ref, line_ref,
            cfree_ref, lfree_ref, scal_ref[0, 0], scal_ref[0, 1],
            B, C, L)
        Wmat = jnp.stack([_dotk(cols[i], cols[6 + j])
                          for i in range(6) for j in range(4)], axis=1)
        pair = idxc * L + idxl
        onehot_p = (pair[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (B, CL), 1)).astype(f32)
        w_out_ref[:] = jnp.dot(onehot_p.T, Wmat,
                               preferred_element_type=f32)[None]

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def fused_eval_pallas(cam_wt, line_orth, obs, obs_cam, obs_line, w_valid,
                      cam_free_f, line_free_f, baseline, huber_delta,
                      chunk=64, interpret=False):
    """Fused evaluate for the dense window BA (robust Huber, orth
    lines): (C,6),(L,4),(O,8),idx -> cost, Hcc (C,6,6), Hll (L,4,4),
    gc (C,6), gl (L,4), W (C,L,6,4).  Semantics = ops/schur_ba.
    _eval_system; cross-checked in tests/test_pallas.py.

    Two pallas_calls (cam/line blocks + the pair-indexed W): the single
    combined kernel exceeds the Mosaic compiler's limits (SIGABRT), and
    each half stays under them at chunk=64.  The Jacobian work is
    recomputed in the second kernel — FLOPs are cheap here; the point is
    that no per-observation Jacobian/one-hot intermediate ever touches
    HBM."""
    C = cam_wt.shape[0]
    L = line_orth.shape[0]
    O = obs.shape[0]
    dtype = cam_wt.dtype
    Opad = ((O + chunk - 1) // chunk) * chunk
    CL = C * L

    def pad(a, fill=0):
        out = jnp.full((Opad,) + a.shape[1:], fill, a.dtype)
        return out.at[:O].set(a)

    obs_p = pad(obs)
    idxc = pad(obs_cam.astype(jnp.int32)).reshape(-1, 1)
    idxl = pad(obs_line.astype(jnp.int32)).reshape(-1, 1)
    wv = pad(w_valid.astype(dtype)).reshape(-1, 1)   # pad rows invalid

    scal = jnp.stack([jnp.asarray(baseline, dtype),
                      jnp.asarray(huber_delta, dtype)]).reshape(1, 2)
    mem = pl.ANY if interpret else pltpu.VMEM
    smem = pl.ANY if interpret else pltpu.SMEM
    in_specs = [
        pl.BlockSpec((chunk, 8), lambda o: (o, 0), memory_space=mem),
        pl.BlockSpec((chunk, 1), lambda o: (o, 0), memory_space=mem),
        pl.BlockSpec((chunk, 1), lambda o: (o, 0), memory_space=mem),
        pl.BlockSpec((chunk, 1), lambda o: (o, 0), memory_space=mem),
        pl.BlockSpec((C, 6), lambda o: (0, 0), memory_space=mem),
        pl.BlockSpec((L, 4), lambda o: (0, 0), memory_space=mem),
        pl.BlockSpec((C, 1), lambda o: (0, 0), memory_space=mem),
        pl.BlockSpec((L, 1), lambda o: (0, 0), memory_space=mem),
        pl.BlockSpec((1, 2), lambda o: (0, 0), memory_space=smem),
    ]
    args = (obs_p, idxc, idxl, wv, cam_wt, line_orth,
            cam_free_f.reshape(-1, 1), line_free_f.reshape(-1, 1), scal)

    G = Opad // chunk
    cam_p, line_p = pl.pallas_call(
        _make_fused_camline_kernel(C, L, chunk),
        grid=(G,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, C, 42), lambda o: (o, 0, 0),
                         memory_space=mem),
            pl.BlockSpec((1, L, 20), lambda o: (o, 0, 0),
                         memory_space=mem),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, C, 42), dtype),
            jax.ShapeDtypeStruct((G, L, 20), dtype),
        ],
        interpret=interpret,
    )(*args)

    W_p = pl.pallas_call(
        _make_fused_w_kernel(C, L, chunk),
        grid=(G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, CL, 24), lambda o: (o, 0, 0),
                               memory_space=mem),
        out_shape=jax.ShapeDtypeStruct((G, CL, 24), dtype),
        interpret=interpret,
    )(*args)

    cam_out = jnp.sum(cam_p, axis=0)
    line_out = jnp.sum(line_p, axis=0)
    Hcc = cam_out[:, :36].reshape(C, 6, 6)
    gc = cam_out[:, 36:]
    Hll = line_out[:, :16].reshape(L, 4, 4)
    gl = line_out[:, 16:]

    # the robust cost comes from a residual-only XLA pass — one more
    # small output crashed the Mosaic helper (see kernel docstrings)
    from .residuals import lba_residual_batch
    from .schur_ba import _robust_weights
    r = lba_residual_batch(cam_wt[obs_cam], line_orth[obs_line], obs,
                           jnp.asarray(baseline, dtype))
    _, cost_i = _robust_weights(r, jnp.asarray(huber_delta, dtype), True)
    cost = jnp.sum(jnp.where(w_valid.astype(dtype) > 0, cost_i, 0.0))
    return (cost, Hcc, Hll, gc, gl,
            jnp.sum(W_p, axis=0).reshape(C, L, 6, 4))
