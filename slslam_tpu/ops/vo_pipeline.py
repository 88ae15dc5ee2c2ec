"""Fused visual-odometry pipeline: RANSAC + motion-only BA + final scoring.

One jitted kernel for the whole of SLAM::pose_estimation's device work
(slam.cpp:244-319): hypothesis sampling/solving/scoring (ransac.py), the
Ceres motion polish (motion_only_ba, slam.cpp:578-675) as a 2-camera
fixed-line instance of the Schur-LM solver, and the final inlier scoring
under the polished motion (slam.cpp:305-314).

Fusing matters doubly on TPU: XLA sees the whole pipeline (no host
round-trips between stages), and remote/tunneled devices pay one dispatch
instead of three.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import geometry as geo
from .ransac import minimal_motion_batch
from .residuals import score_error_hyp_obs
from .schur_ba import local_ba_impl


class VOResult(NamedTuple):
    wt: jnp.ndarray            # (6,) polished motion prev->curr
    ransac_score: jnp.ndarray  # inlier count of the RANSAC winner
    ransac_wt: jnp.ndarray     # (6,) pre-polish winner
    final_errors: jnp.ndarray  # (N,) errors under the polished motion
    num_inliers_used: jnp.ndarray


def vo_body(obs0, obs1, lines_av, valid, key, baseline, error_thr,
            huber_delta, max_t_norm=1.0, num_hyp=256, sample_size=5,
            robust=True, max_iters=10, line_param="orth", relin_iters=1):
    """Traced body of the VO solve; also reused inside the device-resident
    batch engine's scan step (engine/batch.py).  The caller thresholds
    final_errors on the host to form the final inlier set and applies the
    keyframe decision."""
    N = obs0.shape[0]
    dtype = obs0.dtype

    # ---- RANSAC (ops/ransac.py logic, fused) ----
    g = jax.random.gumbel(key, (num_hyp, N), dtype=dtype)
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, samples = jax.lax.top_k(g, sample_size)

    # hypotheses use the reference's single small-angle solve: its
    # O(theta^2) bias makes contaminated 5-samples score POORLY (a sloppy
    # wrong model picks up few coincidental inliers), which is part of
    # the RANSAC's outlier robustness — re-linearized hypotheses measured
    # WORSE under 5% id-swap outliers (itbt3f slice: 0.27 -> 0.72 m ATE)
    wt_h, ok = minimal_motion_batch(obs0[samples], obs1[samples], -baseline)
    R = geo.rodrigues(wt_h[:, :3])
    t = wt_h[:, 3:]

    errors_h = score_error_hyp_obs(obs1, R, t, lines_av, baseline)
    inl_h = jnp.logical_and(errors_h < error_thr, valid[None, :])
    score_h = jnp.sum(inl_h, axis=1)
    hyp_ok = jnp.logical_and(ok, jnp.linalg.norm(t, axis=-1) <= max_t_norm)
    score_h = jnp.where(hyp_ok, score_h, -1)
    best = jnp.argmax(score_h)
    best_wt = wt_h[best]
    best_score = score_h[best]
    inliers = inl_h[best]

    if relin_iters > 1:
        # the WINNER's sample is re-solved with rotation re-linearization,
        # removing the ~3% small-angle bias before the moBA polish
        # (clean-data itbt3f slice: 0.11 -> 0.06 m ATE); two extra tiny
        # solves, not 2*H.  Guarded by a full re-scoring pass: if the
        # winner's sample carried an undetected outlier, the "exact"
        # re-solve overfits it and jumps out of the broad-support basin
        # (unguarded, the 5%-id-swap slice degraded 0.27 -> 0.53 m), so
        # the re-linearized model must win the same inlier vote to be
        # adopted.
        from .ransac import minimal_motion
        wt_r, ok_r = minimal_motion(obs0[samples[best]],
                                    obs1[samples[best]], -baseline,
                                    relin_iters=relin_iters)
        good = jnp.logical_and(ok_r, jnp.all(jnp.isfinite(wt_r)))
        err_r = score_error_hyp_obs(obs1, geo.rodrigues(wt_r[None, :3]),
                                    wt_r[None, 3:], lines_av, baseline)[0]
        inl_r = jnp.logical_and(err_r < error_thr, valid)
        good = jnp.logical_and(good, jnp.sum(inl_r) >= best_score)
        best_wt = jnp.where(good, wt_r, best_wt)
        inliers = jnp.where(good, inl_r, inliers)

    # ---- motion-only BA (slam.cpp:578-675): cam0 free, cam1 fixed,
    # all lines fixed, observations = inliers only (via validity mask) ----
    encoders = {"orth": geo.av_to_orth, "aid": geo.av_to_aid,
                "asd": geo.av_to_asd}
    line_orth = encoders[line_param](lines_av)
    cam = jnp.zeros((4, 6), dtype).at[0].set(best_wt)
    cam_free = jnp.array([True, False, False, False])
    obs_cat = jnp.concatenate([obs1, obs0], axis=0)
    ocam = jnp.concatenate([jnp.zeros(N, jnp.int32),
                            jnp.ones(N, jnp.int32)])
    olin = jnp.concatenate([jnp.arange(N, dtype=jnp.int32)] * 2)
    ovalid = jnp.concatenate([inliers, inliers])

    cam_out, _, _ = local_ba_impl(
        cam, line_orth, obs_cat, ocam, olin, ovalid, cam_free,
        jnp.zeros(N, bool), baseline, huber_delta,
        robust=robust, max_iters=max_iters, line_param=line_param)
    wt = cam_out[0]

    # ---- final scoring under the polished motion (slam.cpp:305-314) ----
    Rf = geo.rodrigues(wt[None, :3])
    final_errors = score_error_hyp_obs(obs1, Rf, wt[None, 3:], lines_av,
                                       baseline)[0]

    return VOResult(wt, best_score, best_wt, final_errors,
                    jnp.sum(inliers.astype(jnp.int32)))


vo_pipeline = jax.jit(
    vo_body, static_argnames=("num_hyp", "sample_size", "robust",
                              "max_iters", "line_param", "relin_iters"))
