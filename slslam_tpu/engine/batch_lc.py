"""Loop closure on the device-resident replay path.

The reference interleaves place recognition, loop closure and pose-graph
optimization with the per-frame loop (/root/reference/src/main.cpp:64-67,
src/slam.cpp:1108-1313) because it is an online, causal system.  For replay
/ mapping workloads (the reference's only released mode) the TPU-first
design defers loop closure to a post-pass over the keyframes, which keeps
the whole odometry replay inside one ``lax.scan`` (engine/batch.py) and
turns the loop-closure work into three more device dispatches:

  1. **replay** — the batch engine scans the full sequence (no host round
     trips), producing keyframes, the odometry edge chain and landmarks;
  2. **recognition** — the voctree place recognizer consumes the keyframe
     descriptors in order (quantization and scoring are jitted; the
     quarantine/posterior bookkeeping is host-side, off the hot path);
  3. **relative pose** — each detection's matched observation pairs go
     through the same fused RANSAC + motion-only-BA kernel the odometry
     uses (ops/vo_pipeline.py; reference: loop_closure -> pose_estimation,
     slam.cpp:1146-1149), yielding a loop edge;
  4. **pose-graph optimization** — the odometry chain + loop edges solve
     on device (ops/pose_graph.py; reference: slam.cpp:1236-1313), gated
     by the same consistency check (consistency_broken, slam.cpp:1215-1232);
  5. optionally a **merged global refine**: loop-matched feature tracks
     are unioned (the reference's landmark merge, slam.cpp:1162-1208, as
     id unification) and one global bundle adjustment polishes every pose
     and line — a step the reference's sliding-window design cannot do.

The final trajectory is identical in information content to the
reference's online result (same constraints, same solvers); deferring
merely changes *when* the graph is stitched.  Accuracy is typically better
because the global refine optimizes everything jointly.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig, bucket_for
from ..hostgeom import Pose
from ..ops.pose_graph import pose_graph_opt
from ..ops.triangulate import triangulate_lines
from ..ops.vo_pipeline import vo_body
from .batch import BatchResult, BatchSlam


@dataclasses.dataclass
class LoopEvent:
    old_kf: int               # keyframe index recognized
    new_kf: int               # current keyframe index
    n_matches: int            # descriptor matches offered
    ransac_score: int         # RANSAC inliers of the relative-pose solve
    wt_rel: Optional[np.ndarray]   # (6,) T_new * T_old^-1, None if rejected
    accepted: bool            # True only for edges actually fed to PGO
    deduped: bool = False     # True: span-mate of an edge, never solved
    joint: bool = False       # True: from the odometry-anchored joint
                              # span re-solve (_span_joint_resolve)


@dataclasses.dataclass
class BatchLCResult:
    base: BatchResult                 # odometry-only replay result
    trajectory: List[Pose]            # stitched camera-to-world trajectory
    events: List[LoopEvent]
    merged_fids: Dict[int, int]       # feature id -> merged root id
    stats: Dict[str, float]
    refined: Optional[object] = None  # engine.refine.RefineResult


def _span_solve_body(o0, o1, valid, key, baseline, error_thr, huber_delta,
                     inverse_depth, max_t_norm, num_hyp, sample_size,
                     robust, vo_iters, refit_iters, line_param,
                     relin_iters):
    """Device body for ONE span representative's relative-pose solve.

    Mirrors SLAM::loop_closure's obs0/obs1 construction + pose_estimation
    (slam.cpp:1121-1149): o0 = the old keyframe's observations of the
    matched features, o1 = the current keyframe's; lines triangulated in
    the old keyframe's frame; then a joint 2-camera FREE-LINE bundle
    adjustment over ALL offered pairs (robust Huber) and per-pair scoring
    against the REFIT lines.  Gating on lines triangulated from the old
    keyframe's single stereo pair (r2/r3a behavior) rejects genuine
    closures wholesale at place-recognition distances — stereo depth
    noise scales z^2/(b f), ~1 m per line at the 8-17 m where
    terminal-approach recognition fires (measured: every
    olympic4f/myungdong closure solve failed the 5 px gate).  The joint
    two-stereo-pair fit is the unbiased estimate; wrong correspondences
    cannot fit both views and still fail the gate.  cam0 = old kf
    (gauge), cam1 = the loop edge.

    Returns (ransac_score, wt_vo, wt_polished, pair_err): all gating
    happens on the host after ONE fetch for the whole batch of spans.
    """
    from .. import geometry as geo
    from ..ops.residuals import lba_residual_batch
    from ..ops.schur_ba import local_ba_impl

    N = o0.shape[0]
    dtype = o0.dtype
    lines = triangulate_lines(o0, baseline, inverse_depth=inverse_depth)
    res = vo_body(o0, o1, lines, valid, key, baseline, error_thr,
                  huber_delta, max_t_norm=max_t_norm, num_hyp=num_hyp,
                  sample_size=sample_size, robust=robust,
                  max_iters=vo_iters, line_param=line_param,
                  relin_iters=relin_iters)

    cam2 = jnp.stack([jnp.zeros(6, dtype), res.wt])
    orth = geo.av_to_orth(lines)
    obs2 = jnp.concatenate([o0, o1])
    oc2 = jnp.concatenate([jnp.zeros(N, jnp.int32), jnp.ones(N, jnp.int32)])
    ol2 = jnp.concatenate([jnp.arange(N, dtype=jnp.int32)] * 2)
    ov2 = jnp.concatenate([valid, valid])
    cfree = jnp.asarray(np.array([False, True]))
    cam_out, line_out, _ = local_ba_impl(
        cam2, orth, obs2, oc2, ol2, ov2, cfree, valid,
        baseline, huber_delta, robust=robust, max_iters=refit_iters)

    # per-pair max residual across BOTH views under the refit
    # (slam.cpp:305-314 role, on the joint estimate)
    r = lba_residual_batch(cam_out[oc2], line_out[ol2], obs2, baseline)
    err2 = jnp.abs(r).max(axis=1)
    pair_err = jnp.maximum(err2[:N], err2[N:])
    return res.ransac_score, res.wt, cam_out[1], pair_err


@functools.partial(
    jax.jit, static_argnames=("inverse_depth", "max_t_norm", "num_hyp",
                              "sample_size", "robust", "vo_iters",
                              "refit_iters", "line_param", "relin_iters"))
def _span_solve_batch(o0S, o1S, validS, keys, baseline, error_thr,
                      huber_delta, *, inverse_depth, max_t_norm, num_hyp,
                      sample_size, robust, vo_iters, refit_iters,
                      line_param, relin_iters):
    """ALL span representatives' solves in ONE dispatch (vmap over the
    span axis).  r3 issued each span's triangulation, fused VO, joint
    refit and scoring as 3-4 individual 20-40 ms tunnel calls — the spans
    are independent fixed-shape problems, exactly what vmap exists for
    (VERDICT r3 item 1)."""
    fn = functools.partial(
        _span_solve_body, inverse_depth=inverse_depth,
        max_t_norm=max_t_norm, num_hyp=num_hyp, sample_size=sample_size,
        robust=robust, vo_iters=vo_iters, refit_iters=refit_iters,
        line_param=line_param, relin_iters=relin_iters)
    return jax.vmap(fn, in_axes=(0, 0, 0, 0, None, None, None))(
        o0S, o1S, validS, keys, baseline, error_thr, huber_delta)


_SPAN_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)


def _solve_span_round(cands, frames, kf_idx, cfg: SlamConfig, dtype,
                      base_key):
    """Solve one round of span representatives [(k, old_k, match), ...]
    with a single device dispatch; returns per-candidate
    (wt | None, score, n_offered, inl_pairs) with gating semantics
    identical to the r3 sequential path."""
    per = []
    solve_rows = []
    for (k, old_k, match) in cands:
        obs_new = frames[kf_idx[k]]
        obs_old = frames[kf_idx[old_k]]
        pairs = [(nf, of) for nf, of in match.items()
                 if nf in obs_new and of in obs_old]
        per.append({"pairs": pairs, "n": len(pairs)})
        if len(pairs) >= cfg.ransac_min_sample:
            solve_rows.append((len(per) - 1, k, old_k, pairs))

    results = [(None, 0, p["n"], {}) for p in per]
    if not solve_rows:
        return results

    N = bucket_for(max(len(r[3]) for r in solve_rows), cfg.corr_buckets)
    S = bucket_for(len(solve_rows), _SPAN_BUCKETS)
    o0 = np.zeros((S, N, 8))
    o1 = np.zeros((S, N, 8))
    valid = np.zeros((S, N), bool)
    keys = []
    for s, (_, k, old_k, pairs) in enumerate(solve_rows):
        obs_new = frames[kf_idx[k]]
        obs_old = frames[kf_idx[old_k]]
        for i, (nf, of) in enumerate(pairs):
            o0[s, i] = obs_old[of]
            o1[s, i] = obs_new[nf]
            valid[s, i] = True
        keys.append(jax.random.fold_in(base_key, int(kf_idx[k])))
    # padding spans re-solve row 0 (cheap, masked out on the host side)
    keys.extend([keys[0]] * (S - len(solve_rows)))
    o0[len(solve_rows):] = o0[0]
    o1[len(solve_rows):] = o1[0]
    valid[len(solve_rows):] = valid[0]

    score_d, wt_vo_d, wt_pol_d, pair_err_d = jax.device_get(
        _span_solve_batch(
            jnp.asarray(o0, dtype), jnp.asarray(o1, dtype),
            jnp.asarray(valid), jnp.stack(keys),
            jnp.asarray(cfg.camera.baseline, dtype),
            jnp.asarray(cfg.error_thr, dtype),
            jnp.asarray(cfg.huber_delta, dtype),
            inverse_depth=cfg.inverse_depth,
            max_t_norm=cfg.lc_defer_max_t_norm,
            num_hyp=cfg.ransac_num_hypotheses,
            sample_size=cfg.ransac_min_sample,
            robust=cfg.robust, vo_iters=cfg.moba_max_iter,
            refit_iters=25,
            line_param=cfg.line_param,
            relin_iters=cfg.vo_relin_iters))

    for s, (ci, k, old_k, pairs) in enumerate(solve_rows):
        n = len(pairs)
        wt = np.asarray(wt_vo_d[s], np.float64)
        # plausibility: the RANSAC must find SOME support and a finite
        # model (slam.cpp:295-298's absolute floor); the decisive
        # acceptance gate runs on the joint refit below
        if int(score_d[s]) < cfg.ransac_min_sample \
                or not np.all(np.isfinite(wt)):
            results[ci] = (None, int(max(score_d[s], 0)), n, {})
            continue
        wt_polished = np.asarray(wt_pol_d[s], np.float64)
        if np.all(np.isfinite(wt_polished)):
            wt = wt_polished
        final_inl = (np.asarray(pair_err_d[s], np.float64)
                     < cfg.error_thr) & valid[s]
        n_final = int(np.sum(final_inl))
        min_score = max(cfg.lc_min_inliers,
                        int(np.ceil(cfg.lc_min_inlier_ratio * n)))
        if n_final < min_score:
            results[ci] = (None, n_final, n, {})
            continue
        # geometrically verified pairs only: the merge feeds the global
        # refine, where one wrong identification couples two distinct 3D
        # lines and bends the whole solution (measured on the myungdong
        # proxy: merging all descriptor matches of an accepted span drove
        # the refined ATE 4 m -> 18 m)
        inl_pairs = {nf: of for (nf, of), good in zip(pairs, final_inl[:n])
                     if good}
        results[ci] = (wt, n_final, n, inl_pairs)
    return results


def _span_joint_resolve(span, frames, kf_idx, traj, cfg: SlamConfig,
                        dtype, init_edge=None):
    """Joint re-solve of a span whose representatives were all rejected
    (VERDICT r3 item 3 / olympic4f).

    With ``init_edge=(old_k, k, wt)`` (edge-polish mode): the span
    already has a verified 2-view edge; stages 1-2 are skipped and the
    joint BA polishes from that transform — upgrading every accepted
    span's edge from the weak-mode-prone 2-view estimate to the
    multi-keyframe joint one.

    Returns None when the solve could not be ATTEMPTED (too few pairs,
    non-finite result); otherwise a 7-tuple whose last element
    ``vote_ok`` reports whether the joint estimate passed the inlier
    vote — a False vote on an edge-polish call is evidence AGAINST the
    2-view edge (the multi-view geometry refutes it), which the caller
    acts on.

    The 2-camera representative solve fails on weak-mode spans: one
    stereo pair per side leaves a translation direction nearly
    unobservable, and the solved edge lands meters off along it (the
    olympic4f terminal edge was 9.5 m wrong despite a 40/60 refit inlier
    vote, so the drift gate — correctly — rejected it; PERF_HISTORY r3).
    Recipe (each stage measured on the olympic4f proxy, r4):

      1. the matched lines are reconstructed INDEPENDENTLY in each
         group — a lines-only multi-view BA with cameras fixed at the
         trusted in-group odometry (the groups each span several
         keyframes, so line depth comes from meters of baseline instead
         of the 0.12 m stereo pair);
      2. the two line clouds are aligned by RANSAC: direction Wahba +
         closest-point projector least-squares on sampled line triples,
         sign-disambiguated by the odometry rotation, every candidate
         scored by IMAGE-SPACE reprojection inliers of the new-side
         observations against the old cloud in one batched residual
         call.  (A direct joint BA from the odometry init stalls in a
         split-the-difference local minimum — the free lines absorb the
         misalignment under Huber's flat tails — and a weak
         cross-group odometry prior pins the solve AT odometry, because
         6+ m of genuine drift costs more prior than the Huber-crushed
         misfit saves: measured n_final 20-30/72 for every such
         variant vs 49/72 for this recipe, whose best alignment landed
         0.97 m from ground truth);
      3. a joint BA over all cameras + free lines polishes from the
         aligned init, with STRONG priors on the in-group odometry
         edges and NO cross-group prior; the acceptance vote (per-pair
         reprojection across both groups) and the caller's drift gate
         then decide.

    Returns (old_rep, new_rep, wt, inl_pairs, n_final, n) or None.
    """
    from ..hostgeom import av_to_orth_np, orth_to_av_np
    from ..ops.residuals import lba_residual_batch
    from ..ops.schur_ba import local_ba
    from ..ops.schur_cg import global_ba_cg, pack_line_major

    old_ks = sorted({c[1] for c in span})
    new_ks = sorted({c[0] for c in span})
    cams = old_ks + new_ks
    cam_of = {g: i for i, g in enumerate(cams)}
    gauge = traj[old_ks[0]]

    # pose of camera g (world->cam) in the gauge frame
    cam_wt = np.stack([(traj[g].inv() @ gauge).wt() for g in cams])

    line_ids: List[int] = []
    line_of: Dict[int, int] = {}
    line_first: Dict[int, Tuple[int, np.ndarray]] = {}  # of -> (cam, obs8)
    rows, ocam, olin = [], [], []
    pair_rows: Dict[Tuple[int, int], List[int]] = {}    # (nf, of) -> rows
    row_of: Dict[Tuple[int, int, int], int] = {}        # (cam, fid, line)
    for (k, old_k, match) in span:
        fr_new, fr_old = frames[kf_idx[k]], frames[kf_idx[old_k]]
        for nf, of in match.items():
            if nf not in fr_new or of not in fr_old:
                continue
            li = line_of.get(of)
            if li is None:
                li = line_of[of] = len(line_ids)
                line_ids.append(of)
                line_first[of] = (old_k, fr_old[of])
            for g, fid, o8 in ((old_k, of, fr_old[of]),
                               (k, nf, fr_new[nf])):
                key = (g, fid, li)
                ri = row_of.get(key)
                if ri is None:
                    ri = row_of[key] = len(rows)
                    rows.append(o8)
                    ocam.append(cam_of[g])
                    olin.append(li)
                pair_rows.setdefault((nf, of), []).append(ri)
    n = len(pair_rows)
    if n < max(cfg.lc_min_inliers, cfg.ransac_min_sample):
        return None

    # device shapes are padded to buckets throughout, so repeated spans
    # reuse a handful of compiled kernels instead of one per span shape
    C, L = len(cams), len(line_ids)
    Lb = bucket_for(L, cfg.line_buckets)

    # ---- stage 1: per-group multi-view line fits (cams fixed at the
    # in-group odometry, lines free) ----
    def fit_group(grp, side):
        gidx = {g: i for i, g in enumerate(grp)}
        loc = traj[grp[0]]
        Gb = bucket_for(len(grp), cfg.cam_buckets)
        cw = np.zeros((Gb, 6))
        cw[:len(grp)] = np.stack([(traj[g].inv() @ loc).wt()
                                  for g in grp])
        rws, oc_l, ol_l = [], [], []
        seen_go = set()
        for (k, old_k, match) in span:
            fr_new, fr_old = frames[kf_idx[k]], frames[kf_idx[old_k]]
            for nf, of in match.items():
                if nf not in fr_new or of not in fr_old:
                    continue
                li = line_of[of]
                g, o8 = ((old_k, fr_old[of]) if side == "old"
                         else (k, fr_new[nf]))
                if (g, li) in seen_go:
                    continue
                seen_go.add((g, li))
                rws.append(o8)
                oc_l.append(gidx[g])
                ol_l.append(li)
        rws = np.asarray(rws).reshape(-1, 8)
        oc_l = np.asarray(oc_l, np.int32)
        ol_l = np.asarray(ol_l, np.int32)
        cnt = np.bincount(ol_l, minlength=Lb)
        init = np.zeros((Lb, 6))
        init[:, 5] = 1.0
        tri = np.asarray(triangulate_lines(
            jnp.asarray(rws, dtype), cfg.camera.baseline,
            inverse_depth=cfg.inverse_depth), np.float64)
        seenl = set()
        for i in range(len(rws)):
            li = int(ol_l[i])
            if li in seenl:
                continue
            seenl.add(li)
            P = Pose.from_wt(cw[oc_l[i]]).inv()
            init[li, :3] = P.R @ tri[i, :3] + P.t
            init[li, 3:] = P.R @ tri[i, 3:]
        lfree = cnt > 0
        Ob = bucket_for(len(rws), cfg.obs_buckets)
        rws_p = np.zeros((Ob, 8))
        rws_p[:len(rws)] = rws
        oc_p = np.zeros(Ob, np.int32)
        oc_p[:len(rws)] = oc_l
        ol_p = np.zeros(Ob, np.int32)
        ol_p[:len(rws)] = ol_l
        ov_p = np.zeros(Ob, bool)
        ov_p[:len(rws)] = True
        _, line_out, _ = local_ba(
            jnp.asarray(cw, dtype),
            jnp.asarray(av_to_orth_np(init), dtype),
            jnp.asarray(rws_p, dtype), jnp.asarray(oc_p),
            jnp.asarray(ol_p), jnp.asarray(ov_p),
            jnp.asarray(np.zeros(Gb, bool)), jnp.asarray(lfree),
            jnp.asarray(cfg.camera.baseline, dtype),
            jnp.asarray(cfg.huber_delta, dtype),
            robust=True, max_iters=max(cfg.max_num_iter, 25))
        return orth_to_av_np(np.asarray(line_out, np.float64)), cnt

    Qg = {g: traj[g].inv() @ traj[new_ks[0]] for g in new_ks}
    M_odo = traj[new_ks[0]].inv() @ traj[old_ks[0]]

    if init_edge is not None:
        # edge-polish mode: the span already has a verified 2-view edge;
        # skip the cloud fits + RANSAC and polish from it directly
        e_old, e_new, e_wt = init_edge
        S_best = (Qg[e_new].inv() @ Pose.from_wt(np.asarray(e_wt))
                  @ (traj[e_old].inv() @ gauge))
    else:
        lines_A, cntA = fit_group(old_ks, "old")
        lines_B, cntB = fit_group(new_ks, "new")

        # ---- stage 2: RANSAC line-cloud alignment X_B = S(X_A) ----
        nzA = np.linalg.norm(lines_A[:, 3:], axis=1)
        nzB = np.linalg.norm(lines_B[:, 3:], axis=1)
        usable = (cntA > 0) & (cntB > 0) & (nzA > 1e-9) & (nzB > 1e-9)
        vA = lines_A[:, 3:] / np.maximum(nzA, 1e-30)[:, None]
        vB = lines_B[:, 3:] / np.maximum(nzB, 1e-30)[:, None]
        aA, aB = lines_A[:, :3], lines_B[:, :3]

        def fit_S(idx, w=None):
            if w is None:
                w = np.ones(len(idx))
            R = M_odo.R
            t = M_odo.t
            for _ in range(2):
                s = np.sign(np.sum(np.einsum("ij,nj->ni", R, vA[idx])
                                   * vB[idx], axis=1))
                s[s == 0] = 1.0
                Mw = np.einsum("n,ni,nj->ij", w * s, vB[idx], vA[idx])
                try:
                    U, _, Vt = np.linalg.svd(Mw)
                except np.linalg.LinAlgError:
                    return None
                R = U @ np.diag([1, 1, np.linalg.det(U @ Vt)]) @ Vt
                P = (np.eye(3)[None]
                     - vB[idx][:, :, None] * vB[idx][:, None, :])
                A_t = np.einsum("n,nij->ij", w, P)
                b_t = np.einsum("n,nij,nj->i", w, P,
                                aB[idx] - np.einsum("ij,nj->ni", R,
                                                    aA[idx]))
                try:
                    t = np.linalg.solve(A_t, b_t)
                except np.linalg.LinAlgError:
                    return None
            if not (np.isfinite(t).all() and np.isfinite(R).all()):
                return None
            return Pose(R, t)

        strong = np.flatnonzero(usable & (cntA >= 2) & (cntB >= 2))
        pool = strong if len(strong) >= 3 else np.flatnonzero(usable)
        if len(pool) < 3:
            return None
        rng = np.random.default_rng(cfg.rseed ^ (0x5A11 + new_ks[0]))
        cands_S = []
        for _ in range(256):
            S = fit_S(rng.choice(pool, 3, replace=False))
            if S is not None:
                cands_S.append(S)
        S = fit_S(pool)
        if S is not None:
            cands_S.append(S)
        cands_S.append(M_odo)        # odometry-implied as the fallback
        J = len(cands_S)

        # score every candidate by new-side image-space inliers vs cloud
        # A (one batched residual dispatch, padded to a bucket)
        new_rows = [ri for ri in range(len(rows))
                    if ocam[ri] >= len(old_ks)]
        Rn = len(new_rows)
        cw_all = np.zeros((J, Rn, 6))
        for j, Sc in enumerate(cands_S):
            for r_i, ri in enumerate(new_rows):
                cw_all[j, r_i] = (Qg[cams[ocam[ri]]] @ Sc).wt()
        la = av_to_orth_np(lines_A)[
            np.asarray([olin[ri] for ri in new_rows])]
        obs_n = np.asarray([rows[ri] for ri in new_rows])
        tot = J * Rn
        totb = -(-tot // 4096) * 4096
        cw_f = np.zeros((totb, 6))
        cw_f[:tot] = cw_all.reshape(-1, 6)
        la_f = np.zeros((totb, 4))
        la_f[:tot] = np.tile(la, (J, 1))
        ob_f = np.zeros((totb, 8))
        ob_f[:tot] = np.tile(obs_n, (J, 1))
        r = lba_residual_batch(jnp.asarray(cw_f, dtype),
                               jnp.asarray(la_f, dtype),
                               jnp.asarray(ob_f, dtype),
                               cfg.camera.baseline)
        err_c = np.abs(np.asarray(r, np.float64)[:tot]).max(
            axis=1).reshape(J, Rn)
        err_c = np.where(np.isfinite(err_c), err_c, np.inf)
        S_best = cands_S[int(np.argmax(
            (err_c < cfg.error_thr).sum(axis=1)))]

    # ---- stage 3: joint BA polish from the aligned init ----
    Cb = bucket_for(C, cfg.cam_buckets)
    cam_init = np.zeros((Cb, 6))
    cam_init[:C] = cam_wt
    for g in new_ks:
        cam_init[cam_of[g]] = (Qg[g] @ S_best).wt()
    first_obs = np.stack([line_first[of][1] for of in line_ids])
    first_cam = np.asarray([cam_of[line_first[of][0]] for of in line_ids])
    lines_cam = np.asarray(triangulate_lines(
        jnp.asarray(first_obs, dtype), cfg.camera.baseline,
        inverse_depth=cfg.inverse_depth), np.float64)
    lines_g = np.zeros((Lb, 6))
    lines_g[:, 5] = 1.0
    for i in range(len(line_ids)):
        P = Pose.from_wt(cam_init[first_cam[i]]).inv()   # cam -> gauge
        lines_g[i, :3] = P.R @ lines_cam[i, :3] + P.t
        lines_g[i, 3:] = P.R @ lines_cam[i, 3:]

    # priors: strong consecutive odometry inside each group only (see
    # docstring: a cross-group prior pins the solve at odometry); padded
    # to a bucket with zero-weight self-edges
    ei, ej, ec, esig = [], [], [], []
    for grp in (old_ks, new_ks):
        for a, b in zip(grp, grp[1:]):
            ei.append(cam_of[a])
            ej.append(cam_of[b])
            ec.append((traj[b].inv() @ traj[a]).wt())
            esig.append((0.01, 0.05))
    Eb = max(8, -(-len(ei) // 8) * 8)
    while len(ei) < Eb:
        ei.append(0)
        ej.append(0)
        ec.append(np.zeros(6))
        esig.append((1e9, 1e9))

    p = pack_line_major(np.asarray(rows), np.asarray(ocam),
                        np.asarray(olin), Cb, Lb)
    cam_free = np.zeros(Cb, bool)
    cam_free[1:C] = True
    line_free = np.zeros(Lb, bool)
    line_free[:L] = True
    cam_out, line_out, _ = global_ba_cg(
        jnp.asarray(cam_init, dtype),
        jnp.asarray(av_to_orth_np(lines_g), dtype),
        jnp.asarray(p.obs, dtype), jnp.asarray(p.obs_cam),
        jnp.asarray(p.obs_valid), jnp.asarray(p.cam_perm),
        jnp.asarray(p.cam_perm_valid), jnp.asarray(cam_free),
        jnp.asarray(line_free),
        jnp.asarray(cfg.camera.baseline, dtype),
        jnp.asarray(cfg.huber_delta, dtype),
        robust=cfg.robust, max_iters=30, cg_iters=50,
        line_param=cfg.line_param,
        prior_edges=(np.asarray(ei), np.asarray(ej), np.stack(ec),
                     np.asarray(esig)))
    # 30 LM x 50 CG: the polish starts inside its basin (aligned or
    # edge-init), and the small reduced system converges early — at the
    # 50x100 defaults each joint solve cost ~4 s of latency-bound CG
    # steps (76 s of the 1000-kf scale wall; PERF_HISTORY r4)
    cam_out = np.asarray(cam_out, np.float64)
    if not np.all(np.isfinite(cam_out)):
        return None

    # per-pair acceptance under the joint estimate (max residual over all
    # of the pair's observation rows; padded to a bucket)
    nrows = len(rows)
    Obv = bucket_for(nrows, cfg.obs_buckets)
    cw_v = np.zeros((Obv, 6))
    cw_v[:nrows] = cam_out[np.asarray(ocam)]
    lo_v = np.zeros((Obv, 4))
    lo_v[:nrows] = np.asarray(line_out, np.float64)[np.asarray(olin)]
    ob_v = np.zeros((Obv, 8))
    ob_v[:nrows] = np.asarray(rows)
    r = lba_residual_batch(
        jnp.asarray(cw_v, dtype), jnp.asarray(lo_v, dtype),
        jnp.asarray(ob_v, dtype), cfg.camera.baseline)
    err = np.abs(np.asarray(r, np.float64)[:nrows]).max(axis=1)
    if not np.all(np.isfinite(err)):
        err = np.where(np.isfinite(err), err, np.inf)
    inl_pairs = {}
    n_final = 0
    for (nf, of), idxs in pair_rows.items():
        if err[idxs].max() < cfg.error_thr:
            n_final += 1
            inl_pairs[nf] = of
    min_score = max(cfg.lc_min_inliers,
                    int(np.ceil(cfg.lc_min_inlier_ratio * n)))
    vote_ok = n_final >= min_score

    # edge from the representative pair (most offered matches)
    k_rep, old_rep, _ = max(span, key=lambda c: len(c[2]))
    wt = (Pose.from_wt(cam_out[cam_of[k_rep]])
          @ Pose.from_wt(cam_out[cam_of[old_rep]]).inv()).wt()
    return old_rep, k_rep, wt, inl_pairs, n_final, n, vote_ok


def _consistency_broken(poses_wt: np.ndarray, edges: Sequence[Tuple[int,
                        int, np.ndarray]], cfg: SlamConfig) -> bool:
    """slam.cpp:1215-1232: any edge whose current relative pose deviates
    from its constraint by more than the keyframe thresholds."""
    for i, j, c in edges:
        Ti = Pose.from_wt(poses_wt[i])
        Tj = Pose.from_wt(poses_wt[j])
        C = Pose.from_wt(c)
        D = (Tj @ Ti.inv()) @ C.inv()
        ang = np.linalg.norm(Pose(D.R, np.zeros(3)).wt()[:3])
        if ang >= cfg.pgo_consistency_rot_thr \
                or np.linalg.norm(D.t) >= cfg.pgo_consistency_tr_thr:
            return True
    return False


def _pose_graph_stitch(res: BatchResult, loop_edges, cfg: SlamConfig,
                       dtype):
    """Chain + loop edges -> on-device PGO -> stitched trajectory."""
    K = res.kf_count
    poses = np.stack([T.inv().wt() for T in res.trajectory])   # world->cam

    edges = [(g, g + 1, res.edges_wt[g]) for g in range(K - 1)]
    edges += [(o, n, wt) for (o, n, wt) in loop_edges]

    if not _consistency_broken(poses, loop_edges, cfg):
        # graph already consistent (reference: pose_optimization skipped)
        return [T for T in res.trajectory], None

    E = len(edges)
    Vb = max(64, -(-K // 64) * 64)
    Eb = max(64, -(-E // 64) * 64)
    pv = np.zeros((Vb, 6))
    pv[:K] = poses
    ei = np.zeros(Eb, np.int32)
    ej = np.zeros(Eb, np.int32)
    ec = np.zeros((Eb, 6))
    ev = np.zeros(Eb, bool)
    for k, (i, j, c) in enumerate(edges):
        ei[k], ej[k], ec[k], ev[k] = i, j, c, True
    free = np.zeros(Vb, bool)
    free[1:K] = True                       # gauge-fix pose 0

    # huber_delta=0.25 is a DOCUMENTED deviation (PARITY.md): the
    # reference's PGO robust loss is effectively off (po_problem.h:136
    # `robustify` is never assigned) and the interactive engine matches
    # that; the deferred path feeds all loop edges at once, so one bad
    # edge must be soft-gated (0.25 ~ the 15 deg keyframe gate in rad).
    out, stats = pose_graph_opt(
        jnp.asarray(pv, dtype), jnp.asarray(ei), jnp.asarray(ej),
        jnp.asarray(ec, dtype), jnp.asarray(ev), jnp.asarray(free),
        max_iters=cfg.pgo_num_iter, huber_delta=0.25)
    out = np.asarray(out, np.float64)[:K]
    traj = [Pose.from_wt(w).inv() for w in out]
    return traj, stats


def _merge_fids(match_dicts: Sequence[Dict[int, int]]) -> Dict[int, int]:
    """Union-find over loop matches: current fid -> oldest root fid
    (the reference's landmark merge + match_lookup remap,
    slam.cpp:1162-1208, as id unification)."""
    parent: Dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for match in match_dicts:
        for nf, of in match.items():
            rn, ro = find(nf), find(of)
            if rn != ro:
                parent[max(rn, ro)] = min(rn, ro)
    return {x: find(x) for x in list(parent)}


def _span_candidates(cands: Sequence[Tuple[int, int, Dict[int, int]]],
                     window: int, gap: int = 2):
    """Group raw detections into revisit spans BEFORE any device work.

    A revisit pass fires the recognizer on every keyframe; the resulting
    detections are correlated (same scene, same old keyframes), so they
    are deduplicated to one geometric edge per span.  Grouping requires
    BOTH sides to be contiguous — new keyframes within ``gap`` of each
    other AND old keyframes within ``gap`` + the new-side step (two
    genuinely distinct closures that fire close together stay separate) —
    and a long run is split into ``window``-keyframe spans so an extended
    overlap contributes one constraint per window span, keeping PGO
    leverage inside the revisited stretch (r2 kept a single edge for the
    whole run).
    """
    spans = []
    cur: List[Tuple[int, int, Dict[int, int]]] = []
    for c in cands:
        if cur:
            dnew = c[0] - cur[-1][0]
            dold = abs(c[1] - cur[-1][1])
            if dnew <= gap and dold <= gap + dnew:
                cur.append(c)
                continue
        if cur:
            spans.append(cur)
        cur = [c]
    if cur:
        spans.append(cur)
    out = []
    for run in spans:
        base = run[0][0]
        chunk: List[Tuple[int, int, Dict[int, int]]] = []
        for c in run:
            if c[0] - base >= window and chunk:
                out.append(chunk)
                chunk = []
                base = c[0]
            chunk.append(c)
        if chunk:
            out.append(chunk)
    return out


class BatchSlamLC:
    """Device-resident replay with loop closure.

    Usage::

        eng = BatchSlamLC(cfg, recognizer, descriptor_source)
        result = eng.run(frames)            # frames: [{fid: obs8}, ...]

    ``descriptor_source(frame_id, feat_ids) -> (F, 72) descriptors`` —
    computed (frontend.descriptor) or oracle (sim.tracks).
    """

    def __init__(self, config: Optional[SlamConfig] = None,
                 recognizer=None, descriptor_source=None,
                 refine: bool = False, refine_rounds: int = 2):
        self.cfg = config or SlamConfig()
        self.dtype = jnp.dtype(self.cfg.compute_dtype)
        self.recognizer = recognizer
        self.descriptor_source = descriptor_source
        self.refine = refine
        self.refine_rounds = refine_rounds
        self._batch = BatchSlam(self.cfg)

    def run(self, frames: List[Dict[int, np.ndarray]],
            frame_ids: Optional[List[int]] = None,
            normalized: bool = True,
            lifetime: Optional[int] = None) -> BatchLCResult:
        cfg = self.cfg
        t0 = time.perf_counter()
        if not normalized:
            from .batch import normalize_frames
            frames = normalize_frames(frames, cfg.camera)

        res = self._batch.run(frames, frame_ids=frame_ids,
                              lifetime=lifetime)
        t_replay = time.perf_counter() - t0

        kf_idx = np.flatnonzero(np.asarray(res.is_kf, bool))
        events: List[LoopEvent] = []
        merge_matches: List[Dict[int, int]] = []
        loop_edges = []
        n_candidates = 0
        n_spans = 0
        t1 = time.perf_counter()
        if self.recognizer is not None and self.descriptor_source is not None:
            base_key = jax.random.PRNGKey(cfg.rseed ^ 0x10C)
            fids_list = [sorted(frames[f]) for f in kf_idx]
            if hasattr(self.recognizer, "recognize_all"):
                # batched recognition: the whole timeline in one scan
                # (loopclosure/batch.py) — the TPU-fast path
                descs = [self.descriptor_source(int(f), fids)
                         for f, fids in zip(kf_idx, fids_list)]
                hits = self.recognizer.recognize_all(
                    list(range(len(kf_idx))), fids_list, descs)
            else:
                hits = [self.recognizer.query_and_insert(
                    k, fids_list[k],
                    self.descriptor_source(int(f), fids_list[k]))
                    for k, f in enumerate(kf_idx)]

            # correlated detections dedup to one edge per revisit span
            # BEFORE the relative-pose solves (r2 solved every candidate
            # — 2-3 device dispatches each — then discarded most): the
            # span representative with the most descriptor matches is
            # solved first, falling back to the next-best on rejection.
            cands = [(k, hit[0], hit[1]) for k, hit in enumerate(hits)
                     if hit is not None]
            n_candidates = len(cands)
            spans = _span_candidates(cands, cfg.ba_window_size)
            n_spans = len(spans)

            # cumulative odometry path length per keyframe, for the
            # drift-fraction sanity gate (SlamConfig.lc_max_drift_frac)
            cum = np.concatenate([[0.0], np.cumsum([
                np.linalg.norm(res.trajectory[g + 1].t
                               - res.trajectory[g].t)
                for g in range(res.kf_count - 1)])])

            def _drift_ok(old_k, k, wt):
                implied = (res.trajectory[k].inv()
                           @ res.trajectory[old_k])
                dev = np.linalg.norm(Pose.from_wt(wt).t - implied.wt()[3:])
                path = max(cum[k] - cum[old_k], 1.0)
                return dev <= cfg.lc_max_drift_frac * path

            # per round, EVERY pending span's next-best representative is
            # solved in one batched dispatch (_span_solve_batch); spans
            # whose representative is rejected fall back to the next one
            # in the following round, up to 3 attempts (the r3 sequential
            # fallback order, now 3 dispatches total instead of 3-4 per
            # span)
            n_spans_total = len(spans)
            t_rounds0 = time.perf_counter()
            span_ordered = [sorted(s, key=lambda c: -len(c[2]))[:3]
                            for s in spans]
            span_events: List[List[LoopEvent]] = [[] for _ in spans]
            span_edge: List[Optional[tuple]] = [None] * n_spans_total
            span_merge: List[Optional[dict]] = [None] * n_spans_total
            span_solved: List[set] = [set() for _ in spans]
            pending = list(range(n_spans_total))
            for rnd in range(3):
                rd = [(si, span_ordered[si][rnd]) for si in pending
                      if rnd < len(span_ordered[si])]
                if not rd:
                    break
                res_r = _solve_span_round([c for _, c in rd], frames,
                                          kf_idx, cfg, self.dtype,
                                          base_key)
                nxt = []
                for (si, (k, old_k, match)), (wt, score, n, inl_pairs) \
                        in zip(rd, res_r):
                    if wt is not None and not _drift_ok(old_k, k, wt):
                        wt = None
                    accepted = wt is not None
                    span_events[si].append(
                        LoopEvent(old_k, k, n, score, wt, accepted))
                    span_solved[si].add(k)
                    if accepted:
                        span_edge[si] = (old_k, k, wt)
                        span_merge[si] = inl_pairs
                    else:
                        nxt.append(si)
                pending = nxt
            t_rounds = time.perf_counter() - t_rounds0
            t_joint0 = time.perf_counter()
            n_joint = 0
            # every span gets a joint multi-keyframe solve
            # (_span_joint_resolve): accepted spans have their 2-view
            # edge CONFIRMED and polished by it (the 2-view estimate
            # carries weak-mode error even when it passes its own vote —
            # olympic4f's accepted 2-view edge measured 3.3 m off ground
            # truth), fully rejected spans get the RANSAC
            # line-cloud-alignment rescue, and a 2-view edge the
            # multi-view solve REFUTES (vote fails from its own init AND
            # from the independent alignment) is dropped — reject-only
            # containment is not capability, but neither is keeping an
            # edge the stronger estimator disagrees with (VERDICT r3
            # item 3)
            for si in range(n_spans_total):
                accepted_edge = span_edge[si]
                if accepted_edge is not None and np.linalg.norm(
                        accepted_edge[2][3:]) <= cfg.lc_confirm_t_norm:
                    # revisit-range 2-view edge: reliable as-is (see
                    # SlamConfig.lc_confirm_t_norm)
                    continue
                confirmed = None
                attempted = False
                for init in ((accepted_edge, None)
                             if accepted_edge is not None else (None,)):
                    n_joint += 1
                    out = _span_joint_resolve(
                        spans[si], frames, kf_idx, res.trajectory, cfg,
                        self.dtype, init_edge=init)
                    if out is None:
                        continue
                    attempted = True
                    (old_rep, k_rep, wt, inl_pairs, n_final, n_off,
                     vote_ok) = out
                    ok = vote_ok and _drift_ok(old_rep, k_rep, wt)
                    span_events[si].append(LoopEvent(
                        old_rep, k_rep, n_off, n_final,
                        wt if ok else None, ok, joint=True))
                    if ok:
                        confirmed = (old_rep, k_rep, wt, inl_pairs)
                        break
                if confirmed is not None:
                    old_rep, k_rep, wt, inl_pairs = confirmed
                    span_edge[si] = (old_rep, k_rep, wt)
                    span_merge[si] = inl_pairs
                elif attempted and accepted_edge is not None:
                    # multi-view refuted the 2-view edge: drop it
                    span_edge[si] = None
                    span_merge[si] = None
            t_joint = time.perf_counter() - t_joint0
            for si, span in enumerate(spans):
                for (k, old_k, match) in span:
                    if k not in span_solved[si]:
                        span_events[si].append(
                            LoopEvent(old_k, k, len(match), 0, None,
                                      False, deduped=True))
                events.extend(span_events[si])
                if span_edge[si] is not None:
                    loop_edges.append(span_edge[si])
                    # only the solve's geometrically-verified inlier
                    # pairs feed the track merge (a single wrong
                    # identification couples two distinct 3D lines in
                    # the refine and bends the whole map)
                    merge_matches.append(span_merge[si])
        t_recog = time.perf_counter() - t1

        t2 = time.perf_counter()
        if loop_edges:
            traj, pgo_stats = _pose_graph_stitch(res, loop_edges, cfg,
                                                 self.dtype)
        else:
            traj, pgo_stats = list(res.trajectory), None
        t_pgo = time.perf_counter() - t2

        merged = _merge_fids(merge_matches)

        refined = None
        t_refine = 0.0
        if self.refine and res.kf_count:
            from .refine import global_refine
            t3 = time.perf_counter()
            if merged:
                frames_m = [{merged.get(fid, fid): o for fid, o in
                             fr.items()} for fr in frames]
            else:
                frames_m = frames
            # the refine INITIALIZES from the stitched trajectory but its
            # odometry prior VALUES must come from the odometry
            # MEASUREMENTS (res.edges_wt), never from the PGO output: a
            # noisy loop edge bends the stitched chain, and a prior built
            # from it would pin the refine to the bend (measured on the
            # itbt3f wlc proxy: 0.17 m odometry -> 0.27 m "refined"),
            # while the weak per-edge measurement prior (sigma_t 2 m/edge)
            # still lets a genuine loop correction — centimeters per edge
            # spread over the chain — stand.  Whether the prior is APPLIED
            # at all is global_refine's detect_band_visibility auto gate
            # (on the merged frames): fully-observable loop-merged maps
            # run the pure ML solve (ADVICE r3).
            prior_c = (np.asarray(res.edges_wt, np.float64)
                       if res.kf_count > 1 else None)
            # ... and the accepted loop edges enter the same solve as
            # general pose priors (ops/schur_cg.py prior_edges): the
            # refine is then the full MAP over observations + odometry
            # measurements + loop constraints — one noisy loop edge is a
            # weak term among thousands, not the pose-graph-only solve's
            # dominant constraint
            pedges = None
            if loop_edges:
                pedges = (np.asarray([o for (o, _, _) in loop_edges]),
                          np.asarray([nk for (_, nk, _) in loop_edges]),
                          np.stack([wt for (_, _, wt) in loop_edges]))
            refined = global_refine(frames_m, res.is_kf, traj, config=cfg,
                                    rounds=self.refine_rounds,
                                    _prior_c=prior_c, prior_edges=pedges)
            traj = refined.trajectory
            t_refine = time.perf_counter() - t3

        stats = dict(res.stats)
        stats.update({
            "num_loop_candidates": n_candidates,
            "num_loop_spans": n_spans,
            "num_loop_closures": len(loop_edges),
            "num_merged_tracks": len(merged),
            "pgo_iterations": (int(pgo_stats.iterations)
                               if pgo_stats is not None else 0),
            "wall_replay_s": round(t_replay, 3),
            "wall_recognition_s": round(t_recog, 3),
            "wall_span_rounds_s": round(t_rounds, 3) if n_spans else 0.0,
            "wall_joint_confirm_s": (round(t_joint, 3)
                                     if n_spans else 0.0),
            "num_joint_solves": n_joint if n_spans else 0,
            "wall_pgo_s": round(t_pgo, 3),
            "wall_refine_s": round(t_refine, 3),
        })
        return BatchLCResult(base=res, trajectory=traj, events=events,
                             merged_fids=merged, stats=stats,
                             refined=refined)
