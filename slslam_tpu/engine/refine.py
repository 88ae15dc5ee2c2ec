"""Post-replay global refinement: one full-sequence bundle adjustment.

The reference can only ever optimize a sliding 2W-keyframe window
(slam.cpp:1374-1382): once a keyframe leaves the window its odometry edge
freezes at whatever accuracy the map had at that moment.  On the
every-frame-keyframe replay workload that freezes the first ~dozen edges
with frozen-triangulation-noise errors along the weakly observable
translation-along-dominant-line-direction mode (see
SlamConfig.ba_init_jitter notes and BENCH.md).

On TPU a *global* BA over every keyframe and landmark is one more Schur
solve — line blocks eliminate batched (L,4,4), and the reduced 6Kx6K camera
system is a single dense Cholesky that the MXU eats for K in the hundreds.
This module rebuilds the full problem from the replayed frames + the batch
engine's estimated trajectory, solves it, and returns the refined
trajectory/lines.  Typical effect on the 400-frame house benchmark:
seed-dependent ATE 0.01-0.34 m -> ~0.003-0.01 m for every seed and dtype.

Solver selection: small problems (C*L below ~4e5) run the exact dense-W
Schur solver (ops/schur_ba.py); larger ones the matrix-free PCG Schur
solver (ops/schur_cg.py, linear memory in observations — the analog of
Ceres ITERATIVE_SCHUR), so global refinement scales to thousands of
keyframes / hundreds of thousands of observations on one chip.  Lines can
additionally be sharded with parallel.dist_local_ba_lines.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig, bucket_for
from ..hostgeom import Pose, av_to_orth_np, orth_to_av_np
from ..ops.schur_ba import local_ba_impl
from ..ops.triangulate import triangulate_lines_host


@dataclasses.dataclass
class RefineResult:
    trajectory: List[Pose]      # refined camera-to-world, rooted at KF 0
    lines_world: np.ndarray     # (L, 6) refined (cp, dv) lines, world frame
    feature_ids: List[int]      # feature id per line row
    initial_cost: float
    final_cost: float
    iterations: int
    num_cams: int
    num_lines: int
    num_obs: int


@dataclasses.dataclass
class GlobalProblemStructure:
    """Trajectory-independent part of the global BA problem: which
    features qualify, their first/last observations, and the flat
    observation index arrays.  Built once and reused across refine rounds
    (rebuilding it per round cost ~0.3 s/seed of pure host work in r2)."""

    feat_ids: List[int]
    first_obs: np.ndarray   # (L, 8)
    last_obs: np.ndarray    # (L, 8)
    first_kf: np.ndarray    # (L,)
    last_kf: np.ndarray     # (L,)
    obs: np.ndarray         # (O, 8)
    ocam: np.ndarray        # (O,) int32
    olin: np.ndarray        # (O,) int32


def build_problem_structure(frames: List[Dict[int, np.ndarray]],
                            is_kf: np.ndarray,
                            min_obs: int = 2) -> GlobalProblemStructure:
    kf_frames = np.flatnonzero(np.asarray(is_kf, bool))

    # feature -> observing keyframe indices
    seen: Dict[int, List[int]] = {}
    for k, f in enumerate(kf_frames):
        for fid in frames[f]:
            seen.setdefault(fid, []).append(k)
    feat_ids = sorted(fid for fid, ks in seen.items() if len(ks) >= min_obs)
    fidx = {fid: i for i, fid in enumerate(feat_ids)}
    L = len(feat_ids)

    first_obs = np.zeros((L, 8))
    last_obs = np.zeros((L, 8))
    first_kf = np.zeros(L, np.int64)
    last_kf = np.zeros(L, np.int64)
    for fid, i in fidx.items():
        k0, k1 = seen[fid][0], seen[fid][-1]
        first_kf[i], last_kf[i] = k0, k1
        first_obs[i] = frames[kf_frames[k0]][fid]
        last_obs[i] = frames[kf_frames[k1]][fid]

    rows, ocam, olin = [], [], []
    for k, f in enumerate(kf_frames):
        for fid, o in frames[f].items():
            i = fidx.get(fid)
            if i is not None:
                rows.append(o)
                ocam.append(k)
                olin.append(i)
    obs = np.asarray(rows, np.float64).reshape(-1, 8)
    ocam = np.asarray(ocam, np.int32)
    olin = np.asarray(olin, np.int32)
    return GlobalProblemStructure(feat_ids, first_obs, last_obs, first_kf,
                                  last_kf, obs, ocam, olin)


def _init_candidates_host(s: GlobalProblemStructure, trajectory: List[Pose],
                          lines_cam: np.ndarray):
    """Host part of init_problem_values: transform the (precomputed)
    stereo triangulation into the world frame and build the wide-baseline
    candidate.  Returns (cam_wt, lines_w, lines_wide)."""
    cam_wt = np.stack([T.inv().wt() for T in trajectory])  # world->cam
    lines_w = np.empty_like(lines_cam)
    R_cw = np.stack([T.R for T in trajectory])
    t_cw = np.stack([T.t for T in trajectory])
    lines_w[:, :3] = np.einsum("lij,lj->li", R_cw[s.first_kf],
                               lines_cam[:, :3]) + t_cw[s.first_kf]
    lines_w[:, 3:] = np.einsum("lij,lj->li", R_cw[s.first_kf],
                               lines_cam[:, 3:])
    lines_wide = _two_view_lines(s.first_obs, s.last_obs, s.first_kf,
                                 s.last_kf, R_cw, t_cw, lines_w)
    return cam_wt, lines_w, lines_wide


def init_problem_values(s: GlobalProblemStructure,
                        trajectory: List[Pose], cfg: SlamConfig):
    """Initial (cam_wt, line_orth) for the given trajectory estimate.

    Line init, two candidates per line:
    (a) stereo triangulation at the first observing keyframe
        (slam.cpp:161-219 semantics, anchored to the global frame).
        The stereo baseline is 0.12 m; at 10+ m depth the init error is
        meters, and a minority of lines start outside their basin
        (measured on the village world: 134/765 lines stuck > 3 px
        after a lines-only solve from this init alone);
    (b) wide-baseline two-view: intersect the back-projected
        interpretation planes of the first and last observing keyframes
        — the keyframe baseline is usually orders of magnitude wider.
    Pick per line whichever candidate fits that line's observations
    best.  Degenerate (b) rows (near-parallel planes) fall back to (a).
    """
    lines_cam = triangulate_lines_host(
        s.first_obs, cfg.camera.baseline,
        inverse_depth=cfg.inverse_depth)
    cam_wt, lines_w, lines_wide = _init_candidates_host(s, trajectory,
                                                        lines_cam)
    lines_w = _pick_better_lines(lines_w, lines_wide, cam_wt, s.obs,
                                 s.ocam, s.olin, cfg)
    return cam_wt, av_to_orth_np(lines_w)


def _init_values_many(structs, trajs, cfg: SlamConfig):
    """init_problem_values for several problems with TWO device calls
    total (one batched triangulation, one batched candidate scoring)
    instead of two per problem — the multi-sequence refine's init would
    otherwise pay 2 * S * rounds tunnel round trips."""
    tri_cat = triangulate_lines_host(
        np.concatenate([s.first_obs for s in structs]),
        cfg.camera.baseline, inverse_depth=cfg.inverse_depth)
    offs = np.cumsum([0] + [len(s.feat_ids) for s in structs])
    cands = [_init_candidates_host(s, t, tri_cat[offs[i]:offs[i + 1]])
             for i, (s, t) in enumerate(zip(structs, trajs))]

    # one flat scoring dispatch for every problem's (a)-vs-(b) pick
    from ..ops.residuals import lba_residual_batch
    rows_cw, rows_lo, rows_obs, olin2s = [], [], [], []
    for s, (cam_wt, la, lb) in zip(structs, cands):
        L = len(la)
        orth2 = np.concatenate([av_to_orth_np(la), av_to_orth_np(lb)])
        olin2 = np.concatenate([s.olin, L + s.olin])
        rows_cw.append(np.concatenate([cam_wt[s.ocam]] * 2))
        rows_lo.append(orth2[olin2])
        rows_obs.append(np.concatenate([s.obs] * 2))
        olin2s.append(olin2)
    cw_f = np.concatenate(rows_cw)
    lo_f = np.concatenate(rows_lo)
    ob_f = np.concatenate(rows_obs)
    tot = len(cw_f)
    totb = -(-tot // 4096) * 4096
    pad = lambda a, w: np.concatenate(
        [a, np.zeros((totb - tot, w))]) if totb > tot else a
    r = lba_residual_batch(jnp.asarray(pad(cw_f, 6)),
                           jnp.asarray(pad(lo_f, 4)),
                           jnp.asarray(pad(ob_f, 8)),
                           cfg.camera.baseline)
    e_f = np.abs(np.asarray(r, np.float64)[:tot]).sum(axis=1)
    e_f = np.where(np.isfinite(e_f), e_f, 1e6)

    out = []
    pos = 0
    for s, (cam_wt, la, lb), olin2 in zip(structs, cands, olin2s):
        L = len(la)
        e = e_f[pos:pos + len(olin2)]
        pos += len(olin2)
        tot_l = np.zeros(2 * L)
        np.add.at(tot_l, olin2, e)
        take_b = tot_l[L:] < tot_l[:L]
        lines = la.copy()
        lines[take_b] = lb[take_b]
        out.append((cam_wt, av_to_orth_np(lines)))
    return out


def build_global_problem(frames: List[Dict[int, np.ndarray]],
                         is_kf: np.ndarray,
                         trajectory: List[Pose],
                         cfg: SlamConfig,
                         min_obs: int = 2):
    """Pack every keyframe observation into one flat BA problem.

    frames: normalized per-frame observations {feature_id: (8,)}.
    is_kf: (F,) which frames became keyframes (BatchResult.is_kf).
    trajectory: estimated camera-to-world pose per keyframe (the init).
    """
    K = int(np.sum(np.asarray(is_kf, bool)))
    assert K == len(trajectory), (K, len(trajectory))
    s = build_problem_structure(frames, is_kf, min_obs=min_obs)
    cam_wt, line_orth = init_problem_values(s, trajectory, cfg)
    return (cam_wt, line_orth, s.obs, s.ocam, s.olin, s.feat_ids)


def _two_view_lines(first_obs, last_obs, first_kf, last_kf, R_cw, t_cw,
                    fallback):
    """Wide-baseline line init: plane-plane intersection across keyframes.

    The left-image segment of keyframe k back-projects to its
    interpretation plane through the camera center (gc_ppp_pi role,
    gc.cpp:100-105, with the camera center as the third point); planes
    from two keyframes meet in the 3D line (gc_pipi_plk role,
    gc.cpp:107-113) — here with the inter-keyframe baseline instead of
    the 0.12 m stereo baseline.  Rows where the planes are near-parallel
    (little baseline or line parallel to motion) take `fallback`.
    """
    L = len(first_obs)

    def plane_w(obs8, kf):
        p1 = np.concatenate([obs8[:, 0:2], np.ones((L, 1))], axis=1)
        p2 = np.concatenate([obs8[:, 2:4], np.ones((L, 1))], axis=1)
        n_c = np.cross(p1, p2)                   # plane normal, cam frame
        # world->cam is X_c = R X_w + t with (R, t) = inv(cam->world):
        # n_c . (R X_w + t) = 0  ->  n_w = R^T n_c, d = n_c . t
        R = np.transpose(R_cw[kf], (0, 2, 1))    # world->cam rotation
        t = -np.einsum("lij,lj->li", R, t_cw[kf])
        n_w = np.einsum("lji,lj->li", R, n_c)
        d = np.einsum("li,li->l", n_c, t)
        return n_w, d

    n1, d1 = plane_w(first_obs, first_kf)
    n2, d2 = plane_w(last_obs, last_kf)

    v = np.cross(n1, n2)
    nn = (np.linalg.norm(n1, axis=1) * np.linalg.norm(n2, axis=1))
    sin_ang = np.linalg.norm(v, axis=1) / np.maximum(nn, 1e-30)

    # min-norm point on both planes: x = A^T (A A^T)^-1 (-d)
    A = np.stack([n1, n2], axis=1)               # (L,2,3)
    M = A @ np.transpose(A, (0, 2, 1))           # (L,2,2)
    det = M[:, 0, 0] * M[:, 1, 1] - M[:, 0, 1] * M[:, 1, 0]
    ok = (sin_ang > 1e-3) & (np.abs(det) > 1e-20)
    det_s = np.where(ok, det, 1.0)
    Minv = np.empty_like(M)
    Minv[:, 0, 0] = M[:, 1, 1] / det_s
    Minv[:, 1, 1] = M[:, 0, 0] / det_s
    Minv[:, 0, 1] = -M[:, 0, 1] / det_s
    Minv[:, 1, 0] = -M[:, 1, 0] / det_s
    y = np.einsum("lij,lj->li", Minv, -np.stack([d1, d2], axis=1))
    x = np.einsum("lji,lj->li", A, y)            # point on the line
    vv = np.maximum(np.sum(v * v, axis=1, keepdims=True), 1e-30)
    cp = np.cross(v, np.cross(x, v)) / vv
    ok &= np.isfinite(cp).all(axis=1) & (np.linalg.norm(cp, axis=1) < 1e3)

    out = fallback.copy()
    out[ok, :3] = cp[ok]
    out[ok, 3:] = v[ok]
    return out


def _pick_better_lines(lines_a, lines_b, cam_wt, obs, ocam, olin, cfg):
    """Per line, keep whichever candidate has lower total |residual| over
    that line's observations.

    One jitted dispatch scores both candidates stacked (2O rows) —
    residual-only (lba_residual_batch); the eager jacfwd variant here cost
    ~2.3 s of host tracing per call (the r2 refine throughput regression).
    """
    from ..ops.residuals import lba_residual_batch

    L = len(lines_a)
    if L == 0 or len(obs) == 0:
        return lines_a
    orth2 = np.concatenate([av_to_orth_np(lines_a), av_to_orth_np(lines_b)])
    olin2 = np.concatenate([olin, L + olin])
    cw2 = np.concatenate([cam_wt[ocam], cam_wt[ocam]])
    obs2 = np.concatenate([obs, obs])
    # pad rows to a 4096 multiple: a novel row count hands jit a fresh
    # shape, and over the remote-compile tunnel even this residual-only
    # kernel costs ~1.4 s per novel shape (each bench seed has its own
    # obs count — measured r5, triangulate_lines_host rationale)
    tot = len(cw2)
    totb = -(-tot // 4096) * 4096
    pad = lambda a, w: (np.concatenate([a, np.zeros((totb - tot, w))])
                        if totb > tot else a)
    r = lba_residual_batch(jnp.asarray(pad(cw2, 6)),
                           jnp.asarray(pad(orth2[olin2], 4)),
                           jnp.asarray(pad(obs2, 8)), cfg.camera.baseline)
    e = np.abs(np.asarray(r)[:tot]).sum(axis=1)
    e = np.where(np.isfinite(e), e, 1e6)
    tot = np.zeros(2 * L)
    np.add.at(tot, olin2, e)
    take_b = tot[L:] < tot[:L]
    out = lines_a.copy()
    out[take_b] = lines_b[take_b]
    return out


_DENSE_W_LIMIT = 400_000   # C*L above this -> matrix-free CG Schur solver
_DENSE_CAM_LIMIT = 128     # cameras above this -> CG (the dense reduced
                           # system is (6C)^2 and its Cholesky is (6C)^3)

_BAND_SPAN_FRAC = 0.5      # a track is "long-range" if it spans >= half
_BAND_LONG_FRAC = 0.05     # the keyframes; < 5% long tracks = band map
_BAND_COVER_FRAC = 0.9     # ... and long tracks must be OBSERVED by
                           # nearly every keyframe to pin the map


def detect_band_visibility(frames, is_kf) -> Tuple[bool, float]:
    """Decide whether the map's visibility graph is band-diagonal.

    A global BA frees every pose against line observations alone; maps
    whose tracks only ever link nearby keyframes (a survey ring, an
    outward-looking orbit) have weakly observable low-frequency bending
    modes that the pure-ML solve can wander in, while maps with
    long-range tracks (a room seen throughout) pin those modes
    themselves.  Measured (tools → /tmp/prior_exp r3): the odometry
    prior costs 30x accuracy on the fully-observable house replay
    (0.0015 → 0.046 m) and buys 2.4x on the band-visibility village
    ring (0.0248 → 0.0105 m) — so the prior must follow the structure.

    Long tracks only rigidify the stretch of trajectory that actually
    OBSERVES them: a loop-merged revisit track spans the whole timeline
    by id but is seen only around the two overlap regions, leaving the
    arc between free to bend (measured on the village-orbit LC workload:
    counting merged spans as "fully observable" turned the prior off and
    cost 0.0199 vs 0.0105 m refined ATE — even though 70% of keyframes
    observed a merged track, the single-visit arc still bent).  So the
    map counts as fully-observable only if long tracks exist AND nearly
    every keyframe (_BAND_COVER_FRAC) observes one.

    Returns (is_band, fraction_of_long_tracks).
    """
    kf_frames = np.flatnonzero(np.asarray(is_kf, bool))
    K = len(kf_frames)
    if K < 3:
        return False, 1.0
    first: Dict[int, int] = {}
    last: Dict[int, int] = {}
    for k, f in enumerate(kf_frames):
        for fid in frames[f]:
            first.setdefault(fid, k)
            last[fid] = k
    spans = np.asarray([last[f] - first[f] for f in first
                        if last[f] > first[f]])
    if len(spans) == 0:
        return False, 1.0
    span_thr = _BAND_SPAN_FRAC * (K - 1)
    frac_long = float(np.mean(spans >= span_thr))
    if frac_long < _BAND_LONG_FRAC:
        return True, frac_long
    long_fids = {fid for fid in first if last[fid] - first[fid] >= span_thr}
    cover = np.zeros(K, bool)
    for k, f in enumerate(kf_frames):
        if any(fid in long_fids for fid in frames[f]):
            cover[k] = True
    return bool(cover.mean() < _BAND_COVER_FRAC), frac_long


def global_refine(frames: List[Dict[int, np.ndarray]],
                  is_kf: np.ndarray,
                  trajectory: List[Pose],
                  config: Optional[SlamConfig] = None,
                  max_iters: int = 25,
                  min_obs: int = 2,
                  rounds: int = 2,
                  method: str = "auto",
                  odometry_prior="auto",
                  _prior_c: Optional[np.ndarray] = None,
                  prior_edges=None) -> RefineResult:
    """Globally bundle-adjust a replayed sequence.

    Use after BatchSlam.run (or the interactive engine) on odometry-chain
    sequences:  ``ref = global_refine(frames, res.is_kf, res.trajectory)``.

    ``rounds > 1`` re-runs the whole solve with lines re-triangulated from
    the refined poses: the first pass's line init carries single-stereo-pair
    depth noise (depth^2/baseline) that puts LM into a slow-descent valley;
    a fresh triangulation from better poses restarts it near the basin.
    Measured on the 60-frame house replay: ATE 0.375 -> 0.098 (1 round)
    -> 0.037 (2 rounds); a 3rd round oscillates within noise.
    """
    cfg = config or SlamConfig()
    # Optional odometry-chain prior: constraints come from the trajectory
    # the refine was CALLED with (the replay's odometry/stitched chain —
    # the measurement), not from intermediate rounds' estimates.  It pins
    # the global BA's weakly observable bending modes (band-local
    # visibility: survey rings, outward-looking orbits) that the
    # pure-observation ML estimate wanders in — but it also resists
    # observable corrections (measured on the every-frame-keyframe house
    # replay: ATE 0.0015 without prior, 0.046 with the weak sigma, 0.42
    # with a strong one), so the "auto" default keys it off the map's
    # visibility structure (detect_band_visibility): band-local maps get
    # the prior, maps with long-range tracks — including loop-merged
    # revisits, which rigidify the weak modes — run the pure ML solve.
    if odometry_prior == "auto":
        odometry_prior, _ = detect_band_visibility(frames, is_kf)
    if not odometry_prior:
        # the gate governs an explicitly-passed _prior_c too: _prior_c
        # supplies the constraint VALUES (e.g. batch_lc passes the raw
        # odometry measurements rather than the stitched chain), but
        # whether the prior is applied at all follows the visibility
        # structure — fully-observable maps pay up to 30x ATE for it
        # (0.0015 -> 0.046 m on the house replay; ADVICE r3).  Pass
        # odometry_prior=True to force it on.
        _prior_c = None
    elif _prior_c is None and len(trajectory) > 1:
        _prior_c = np.stack([
            (trajectory[i + 1].inv() @ trajectory[i]).wt()
            for i in range(len(trajectory) - 1)])
    dtype = jnp.dtype(cfg.compute_dtype)

    s = build_problem_structure(frames, is_kf, min_obs=min_obs)
    K = len(trajectory)
    L, O = len(s.feat_ids), len(s.obs)
    if L == 0 or O == 0:
        # degenerate sequence: nothing observed twice — return the input
        return RefineResult(
            trajectory=list(trajectory), lines_world=np.zeros((0, 6)),
            feature_ids=[], initial_cost=0.0, final_cost=0.0, iterations=0,
            num_cams=K, num_lines=0, num_obs=0)

    if (_prior_c is not None or prior_edges is not None) \
            and method == "dense":
        # priors are implemented on the CG path only — never drop them
        # silently (ADVICE r2)
        import warnings
        warnings.warn("global_refine: pose priors require the CG "
                      "solver; overriding method='dense' -> 'cg'")
        method = "cg"
    if method == "auto":
        # dense is fastest only for small problems on CPU; on accelerators
        # its scatter/one-hot assembly loses to the CG path's bucketed
        # dense reductions at any size.  The odometry prior is implemented
        # on the CG path only.
        import jax
        small = K * L <= _DENSE_W_LIMIT and K <= _DENSE_CAM_LIMIT
        method = "dense" if (small and jax.default_backend() == "cpu"
                             and _prior_c is None
                             and prior_edges is None) else "cg"

    cam_free = np.ones(K, bool)
    cam_free[0] = False                      # gauge: world = KF0 camera

    # Solver closure over the (round-invariant) packed layout.
    if method == "cg":
        from ..ops.schur_cg import global_ba_cg, pack_line_major

        p = pack_line_major(s.obs, s.ocam, s.olin, K, L)
        line_free = np.ones(L, bool)
        prior = (jnp.asarray(_prior_c, dtype)
                 if _prior_c is not None else None)
        pedges = None
        if prior_edges is not None:
            ei, ej, ec = prior_edges
            pedges = (jnp.asarray(ei, jnp.int32),
                      jnp.asarray(ej, jnp.int32), jnp.asarray(ec, dtype))

        def solve(cam_in, line_in, cfree, iters):
            return global_ba_cg(
                jnp.asarray(cam_in, dtype), jnp.asarray(line_in, dtype),
                jnp.asarray(p.obs, dtype), jnp.asarray(p.obs_cam),
                jnp.asarray(p.obs_valid), jnp.asarray(p.cam_perm),
                jnp.asarray(p.cam_perm_valid), jnp.asarray(cfree),
                jnp.asarray(line_free),
                jnp.asarray(cfg.camera.baseline, dtype),
                jnp.asarray(cfg.huber_delta, dtype),
                robust=cfg.robust, max_iters=iters,
                line_param=cfg.line_param, prior_c=prior,
                prior_sigma_rot=cfg.refine_prior_sigma_rot,
                prior_sigma_t=cfg.refine_prior_sigma_t,
                prior_edges=pedges)
    else:
        Lb = bucket_for(L, cfg.line_buckets)
        Ob = 1024 * max(1, -(-O // 1024))
        obs_p = np.zeros((Ob, 8))
        obs_p[:O] = s.obs
        ocam_p = np.zeros(Ob, np.int32)
        ocam_p[:O] = s.ocam
        olin_p = np.zeros(Ob, np.int32)
        olin_p[:O] = s.olin
        ovalid = np.zeros(Ob, bool)
        ovalid[:O] = True
        line_free = np.zeros(Lb, bool)
        line_free[:L] = True

        def solve(cam_in, line_in, cfree, iters):
            lorth_p = np.zeros((Lb, 4))
            lorth_p[:, 3] = 0.5
            lorth_p[:L] = line_in
            return local_ba_impl(
                jnp.asarray(cam_in, dtype), jnp.asarray(lorth_p, dtype),
                jnp.asarray(obs_p, dtype), jnp.asarray(ocam_p),
                jnp.asarray(olin_p), jnp.asarray(ovalid),
                jnp.asarray(cfree), jnp.asarray(line_free),
                jnp.asarray(cfg.camera.baseline, dtype),
                jnp.asarray(cfg.huber_delta, dtype),
                robust=cfg.robust, max_iters=iters,
                line_param=cfg.line_param, assembly="scatter")

    # Rounds: each round re-inits lines from the current trajectory
    # (fresh triangulation restarts LM near the basin — the first pass's
    # stereo-depth noise puts it in a slow-descent valley; measured on
    # the 60-frame house replay: ATE 0.375 -> 0.098 (1 round) -> 0.037
    # (2 rounds)).  Round 1 additionally stages a lines-only solve
    # (cameras fixed): independent well-conditioned 4-DoF problems land
    # the lines in the right basin before poses move (joint-only stalls
    # at cost 0.146 / ATE 0.24 on the gated-keyframe run).  Later rounds
    # start from refined poses, so the staged solve is redundant — one
    # joint solve each (3 device solves total for rounds=2, was 4).
    initial_cost = None
    iterations = 0
    traj = list(trajectory)
    for r in range(rounds):
        cam_wt, line_orth = init_problem_values(s, traj, cfg)
        if r == 0:
            _, line_orth, _ = solve(cam_wt, line_orth,
                                    np.zeros(K, bool), max_iters)
            line_orth = np.asarray(line_orth, np.float64)[:L]
        cam_out, line_out, stats = solve(cam_wt, line_orth, cam_free,
                                         max_iters)
        cam_out = np.asarray(cam_out, np.float64)
        line_out = np.asarray(line_out, np.float64)[:L]
        traj = [Pose.from_wt(w).inv() for w in cam_out]
        if initial_cost is None:
            initial_cost = float(stats.initial_cost)
        iterations += int(stats.iterations)

    lines_w = orth_to_av_np(line_out)
    return RefineResult(
        trajectory=traj, lines_world=lines_w, feature_ids=s.feat_ids,
        initial_cost=initial_cost,
        final_cost=float(stats.final_cost),
        iterations=iterations,
        num_cams=K, num_lines=L, num_obs=O)


# ---------------------------------------------------------------------------
# Batched multi-sequence refine (one vmapped solve per round)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("robust", "max_iters",
                                             "cg_iters", "line_param"))
def _ba_cg_many(cam, line, obs, ocam, ovalid, cperm, cpermv, cfree, lfree,
                baseline, huber_delta, *, robust, max_iters, cg_iters,
                line_param):
    from ..ops.schur_cg import global_ba_cg_impl

    def one(c, l, o, oc, ov, cp, cpv, cf, lf):
        return global_ba_cg_impl(c, l, o, oc, ov, cp, cpv, cf, lf,
                                 baseline, huber_delta, robust=robust,
                                 max_iters=max_iters, cg_iters=cg_iters,
                                 line_param=line_param)

    return jax.vmap(one)(cam, line, obs, ocam, ovalid, cperm, cpermv,
                         cfree, lfree)


def global_refine_many(items, config: Optional[SlamConfig] = None,
                       max_iters: int = 25, min_obs: int = 2,
                       rounds: int = 2) -> List[RefineResult]:
    """global_refine over S independent replayed sequences with ONE
    vmapped device solve per stage (VERDICT r4 item 1: the bench's five
    seeds ran their refines serially while the chip sat idle).

    items: list of (frames, is_kf, trajectory).  Problems are padded to
    shared camera/line/bucket shapes and solved lane-parallel on the CG
    path; each lane's solve is the same independent problem the serial
    path would run.  Sequences that need the odometry prior (band
    visibility) or are degenerate fall back to the serial path — the
    bench workloads are fully-observable prior-off maps.
    """
    cfg = config or SlamConfig()
    dtype = jnp.dtype(cfg.compute_dtype)
    structs = [build_problem_structure(f, k, min_obs=min_obs)
               for f, k, _ in items]
    priors = [detect_band_visibility(f, k)[0] for f, k, _ in items]
    if any(priors) or any(len(s.feat_ids) == 0 or len(s.obs) == 0
                          for s in structs):
        return [global_refine(f, k, t, config=cfg, max_iters=max_iters,
                              min_obs=min_obs, rounds=rounds)
                for f, k, t in items]

    from ..ops.schur_cg import pack_line_major

    S = len(items)
    Ks = [len(t) for _, _, t in items]
    Kb = max(Ks)
    Ls = [len(s.feat_ids) for s in structs]
    Os = [len(s.obs) for s in structs]
    Lb = bucket_for(max(Ls), cfg.line_buckets)
    rnd8 = lambda n: max(8, -(-n // 8) * 8)
    kL = rnd8(max(int(np.bincount(s.olin).max()) for s in structs))
    kC = rnd8(max(int(np.bincount(s.ocam).max()) for s in structs))
    packs = [pack_line_major(s.obs, s.ocam, s.olin, Kb, Lb, k_l=kL,
                             k_c=kC) for s in structs]

    obs_b = jnp.asarray(np.stack([p.obs for p in packs]), dtype)
    ocam_b = jnp.asarray(np.stack([p.obs_cam for p in packs]))
    ovalid_b = jnp.asarray(np.stack([p.obs_valid for p in packs]))
    cperm_b = jnp.asarray(np.stack([p.cam_perm for p in packs]))
    cpermv_b = jnp.asarray(np.stack([p.cam_perm_valid for p in packs]))
    cam_free = np.zeros((S, Kb), bool)
    line_free = np.zeros((S, Lb), bool)
    for i in range(S):
        cam_free[i, 1:Ks[i]] = True           # gauge: world = KF0 camera
        line_free[i, :Ls[i]] = True
    cfree_b = jnp.asarray(cam_free)
    lfree_b = jnp.asarray(line_free)
    nofree_b = jnp.zeros_like(cfree_b)
    bl = jnp.asarray(cfg.camera.baseline, dtype)
    hd = jnp.asarray(cfg.huber_delta, dtype)

    def solve(cam_in, line_in, cfree, iters):
        return _ba_cg_many(jnp.asarray(cam_in, dtype),
                           jnp.asarray(line_in, dtype), obs_b, ocam_b,
                           ovalid_b, cperm_b, cpermv_b, cfree, lfree_b,
                           bl, hd, robust=cfg.robust, max_iters=iters,
                           cg_iters=100, line_param=cfg.line_param)

    trajs = [list(t) for _, _, t in items]
    initial_cost = [None] * S
    iterations = [0] * S
    for r in range(rounds):
        inits = _init_values_many(structs, trajs, cfg)
        cam_in = np.zeros((S, Kb, 6))
        line_in = np.zeros((S, Lb, 4))
        line_in[:, :, 3] = 0.5                # benign padding rows
        for i, (cw, lo) in enumerate(inits):
            cam_in[i, :Ks[i]] = cw
            line_in[i, :Ls[i]] = lo
        if r == 0:
            # staged lines-only solve (see global_refine round 0)
            _, line_out, _ = solve(cam_in, line_in, nofree_b, max_iters)
            line_in = np.asarray(line_out, np.float64)
        cam_out, line_out, stats = solve(cam_in, line_in, cfree_b,
                                         max_iters)
        cam_out = np.asarray(cam_out, np.float64)
        line_out = np.asarray(line_out, np.float64)
        for i in range(S):
            trajs[i] = [Pose.from_wt(w).inv() for w in cam_out[i, :Ks[i]]]
            if initial_cost[i] is None:
                initial_cost[i] = float(stats.initial_cost[i])
            iterations[i] += int(stats.iterations[i])

    return [RefineResult(
        trajectory=trajs[i],
        lines_world=orth_to_av_np(line_out[i, :Ls[i]]),
        feature_ids=structs[i].feat_ids,
        initial_cost=initial_cost[i],
        final_cost=float(stats.final_cost[i]),
        iterations=iterations[i],
        num_cams=Ks[i], num_lines=Ls[i], num_obs=Os[i])
        for i in range(S)]
