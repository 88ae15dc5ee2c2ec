"""Benchmark: end-to-end keyframe throughput on the house simulation.

Prints ONE JSON line:
  {"metric": "keyframes_per_s", "value": N, "unit": "kf/s", "vs_baseline": R}

Baseline: the reference's own simulation benchmark — 400 keyframes in
35.85 s (orthonormal parameterization, basize 10, single CPU core;
/root/reference/matlab_script/result_comp_ancdir_orthonorm/
ba_result_orthonorm_err0.2_basize10_maxnumiter1000.txt line 2 and the
400-row trajectory file) = 11.16 kf/s.  The workload here matches that
setup: every frame is a keyframe, ~70 line landmarks, basize 10, 0.2 px
observation noise, full VO + windowed BA per frame.

Also reports (stderr) the per-stage means so BA wall-clock can be compared
against the reference's Ceres numbers.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np


def main():
    import jax

    platform = jax.devices()[0].platform
    if platform == "cpu":
        jax.config.update("jax_enable_x64", True)

    from slslam_tpu.config import SlamConfig
    from slslam_tpu.engine import Slam
    from slslam_tpu.sim import (StereoLineRenderer, house_segments,
                                wave_trajectory)

    # Match the reference sim's cadence: every frame a keyframe (the
    # committed sim trajectories have one row per frame).  Tiny KF
    # thresholds force that; 0.2 px noise matches the headline row.
    # Single fixed capacity buckets: exactly one compile per kernel type
    # (remote/tunneled TPU dispatch makes compiles expensive).
    num_frames = 110
    warmup_frames = 25
    cfg = dataclasses.replace(
        SlamConfig(),
        compute_dtype="float64" if platform == "cpu" else "float32",
        kf_rot_thr=1e-9, kf_tr_thr=1e-9,
        obs_buckets=(2048,), cam_buckets=(48,), line_buckets=(128,),
    )
    segs = house_segments()
    poses_gt = wave_trajectory(num_frames=400)[:num_frames]
    ren = StereoLineRenderer(segs, cfg.camera, noise_px=0.2, seed=4)
    frames = [ren.observe(T) for T in poses_gt]

    slam = Slam(cfg)
    # warmup: populates jit caches for all bucket shapes seen in steady state
    for i in range(warmup_frames):
        slam.process_frame(frames[i], i)

    kf0 = len(slam.state.kfs)
    t0 = time.perf_counter()
    for i in range(warmup_frames, num_frames):
        slam.process_frame(frames[i], i)
    wall = time.perf_counter() - t0
    nkf = len(slam.state.kfs) - kf0

    kf_per_s = nkf / wall
    baseline = 400.0 / 35.85  # reference sim, single CPU core
    stats = slam.post_processing()

    print(json.dumps({
        "platform": platform,
        "ba_mean_ms": stats["proc_local_ba_mean_s"] * 1e3,
        "vo_mean_ms": stats["proc_pose_estimation_mean_s"] * 1e3,
        "avg_ba_iterations": stats["avg_num_iterations"],
        "keyframes": nkf,
    }), file=sys.stderr)

    print(json.dumps({
        "metric": "keyframes_per_s",
        "value": round(kf_per_s, 3),
        "unit": "kf/s",
        "vs_baseline": round(kf_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
