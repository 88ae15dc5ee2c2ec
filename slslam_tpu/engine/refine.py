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
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig, bucket_for
from ..hostgeom import Pose, av_to_orth_np, orth_to_av_np
from ..ops.schur_ba import local_ba_impl
from ..ops.triangulate import triangulate_lines


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
    kf_frames = np.flatnonzero(np.asarray(is_kf, bool))
    K = len(kf_frames)
    assert K == len(trajectory), (K, len(trajectory))

    # feature -> observing keyframe indices
    seen: Dict[int, List[int]] = {}
    for k, f in enumerate(kf_frames):
        for fid in frames[f]:
            seen.setdefault(fid, []).append(k)
    feat_ids = sorted(fid for fid, ks in seen.items() if len(ks) >= min_obs)
    fidx = {fid: i for i, fid in enumerate(feat_ids)}
    L = len(feat_ids)

    cam_wt = np.stack([T.inv().wt() for T in trajectory])  # world->cam

    # line init: fresh stereo triangulation at the first observing keyframe,
    # transported into the world frame with the estimated pose
    # (slam.cpp:161-219 semantics, but anchored to the global frame)
    first_obs = np.zeros((L, 8))
    first_kf = np.zeros(L, np.int64)
    for fid, i in fidx.items():
        k = seen[fid][0]
        first_kf[i] = k
        first_obs[i] = frames[kf_frames[k]][fid]
    lines_cam = np.asarray(triangulate_lines(
        jnp.asarray(first_obs), cfg.camera.baseline,
        inverse_depth=cfg.inverse_depth), np.float64)
    lines_w = np.empty_like(lines_cam)
    for i in range(L):
        T = trajectory[first_kf[i]]              # cam -> world
        lines_w[i, :3] = T.R @ lines_cam[i, :3] + T.t
        lines_w[i, 3:] = T.R @ lines_cam[i, 3:]
    line_orth = av_to_orth_np(lines_w)

    rows, ocam, olin = [], [], []
    for k, f in enumerate(kf_frames):
        for fid, o in frames[f].items():
            i = fidx.get(fid)
            if i is not None:
                rows.append(o)
                ocam.append(k)
                olin.append(i)
    obs = np.asarray(rows, np.float64).reshape(-1, 8)
    return (cam_wt, line_orth, obs, np.asarray(ocam, np.int32),
            np.asarray(olin, np.int32), feat_ids)


_DENSE_W_LIMIT = 400_000   # C*L above this -> matrix-free CG Schur solver


def global_refine(frames: List[Dict[int, np.ndarray]],
                  is_kf: np.ndarray,
                  trajectory: List[Pose],
                  config: Optional[SlamConfig] = None,
                  max_iters: int = 25,
                  min_obs: int = 2,
                  rounds: int = 2,
                  method: str = "auto") -> RefineResult:
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
    inner = None
    if rounds > 1:
        inner = global_refine(frames, is_kf, trajectory, config=cfg,
                              max_iters=max_iters, min_obs=min_obs,
                              rounds=rounds - 1, method=method)
        trajectory = inner.trajectory
    dtype = jnp.dtype(cfg.compute_dtype)

    cam_wt, line_orth, obs, ocam, olin, feat_ids = build_global_problem(
        frames, is_kf, trajectory, cfg, min_obs=min_obs)
    K, L, O = len(cam_wt), len(line_orth), len(obs)
    if L == 0 or O == 0:
        # degenerate sequence: nothing observed twice — return the input
        return RefineResult(
            trajectory=list(trajectory), lines_world=np.zeros((0, 6)),
            feature_ids=[], initial_cost=0.0, final_cost=0.0, iterations=0,
            num_cams=K, num_lines=0, num_obs=0)

    if method == "auto":
        method = "cg" if K * L > _DENSE_W_LIMIT else "dense"

    cam_free = np.ones(K, bool)
    cam_free[0] = False                      # gauge: world = KF0 camera

    # Staged solve: lines first (cameras fixed), then joint.  The line
    # init carries single-stereo-pair depth noise; solving lines alone is
    # a batch of independent well-conditioned 4-DoF problems that lands
    # them in the right basin before poses are allowed to move (measured
    # on the 60-frame gated-keyframe run: joint-only stalls at cost 0.146
    # / ATE 0.24, staged reaches the basin).
    if method == "cg":
        from ..ops.schur_cg import global_ba_cg, pack_line_major

        p = pack_line_major(obs, ocam, olin, K, L)
        line_free = np.ones(L, bool)

        def solve_cg(cam_in, line_in, cfree, iters):
            return global_ba_cg(
                jnp.asarray(cam_in, dtype), jnp.asarray(line_in, dtype),
                jnp.asarray(p.obs, dtype), jnp.asarray(p.obs_cam),
                jnp.asarray(p.obs_valid), jnp.asarray(p.cam_perm),
                jnp.asarray(p.cam_perm_valid), jnp.asarray(cfree),
                jnp.asarray(line_free),
                jnp.asarray(cfg.camera.baseline, dtype),
                jnp.asarray(cfg.huber_delta, dtype),
                robust=cfg.robust, max_iters=iters,
                line_param=cfg.line_param)

        _, line_st, _ = solve_cg(cam_wt, line_orth,
                                 np.zeros(K, bool), max_iters)
        cam_out, line_out, stats = solve_cg(cam_wt, line_st, cam_free,
                                            max_iters)
    else:
        Lb = bucket_for(L, cfg.line_buckets)
        Ob = 1024 * max(1, -(-O // 1024))
        lorth_p = np.zeros((Lb, 4))
        lorth_p[:, 3] = 0.5
        lorth_p[:L] = line_orth
        obs_p = np.zeros((Ob, 8))
        obs_p[:O] = obs
        ocam_p = np.zeros(Ob, np.int32)
        ocam_p[:O] = ocam
        olin_p = np.zeros(Ob, np.int32)
        olin_p[:O] = olin
        ovalid = np.zeros(Ob, bool)
        ovalid[:O] = True
        line_free = np.zeros(Lb, bool)
        line_free[:L] = True

        def solve_dense(cam_in, line_in, cfree, iters):
            return local_ba_impl(
                jnp.asarray(cam_in, dtype), jnp.asarray(line_in, dtype),
                jnp.asarray(obs_p, dtype), jnp.asarray(ocam_p),
                jnp.asarray(olin_p), jnp.asarray(ovalid),
                jnp.asarray(cfree), jnp.asarray(line_free),
                jnp.asarray(cfg.camera.baseline, dtype),
                jnp.asarray(cfg.huber_delta, dtype),
                robust=cfg.robust, max_iters=iters,
                line_param=cfg.line_param, assembly="scatter")

        _, line_st, _ = solve_dense(cam_wt, lorth_p,
                                    np.zeros(K, bool), max_iters)
        cam_out, line_out, stats = solve_dense(cam_wt, line_st, cam_free,
                                               max_iters)

    cam_out = np.asarray(cam_out, np.float64)
    line_out = np.asarray(line_out, np.float64)[:L]
    traj = [Pose.from_wt(w).inv() for w in cam_out]
    lines_w = orth_to_av_np(line_out)
    # across rounds: report the first round's pre-refine cost and the total
    # LM work (the per-round numbers would understate both)
    initial_cost = (inner.initial_cost if inner is not None
                    else float(stats.initial_cost))
    iterations = int(stats.iterations) + (inner.iterations
                                          if inner is not None else 0)
    return RefineResult(
        trajectory=traj, lines_world=lines_w, feature_ids=feat_ids,
        initial_cost=initial_cost,
        final_cost=float(stats.final_cost),
        iterations=iterations,
        num_cams=K, num_lines=L, num_obs=O)
