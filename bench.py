"""Benchmark: end-to-end keyframe throughput on the house simulation.

Prints ONE JSON line:
  {"metric": "keyframes_per_s", "value": N, "unit": "kf/s", "vs_baseline": R}

Baseline: the reference's own simulation benchmark — 400 keyframes in
35.85 s (orthonormal parameterization, basize 10, single CPU core;
/root/reference/matlab_script/result_comp_ancdir_orthonorm/
ba_result_orthonorm_err0.2_basize10_maxnumiter1000.txt line 2 and the
400-row trajectory file) = 11.16 kf/s.  The workload matches that setup:
every frame a keyframe, ~70 line landmarks, basize 10, 0.2 px observation
noise, full VO + windowed Schur-LM BA per frame.

Headline path: the device-resident batch engine (engine/batch.py) — the
whole replay as one lax.scan, zero per-frame host round trips; identical
per-frame math to the interactive engine (cross-checked in
tests/test_batch_engine.py).  Set BENCH_MODE=interactive to measure the
per-frame host-loop engine instead (2 device dispatches per keyframe —
tunnel-latency-bound in this environment).

Defensive against slow/tunneled device backends: a wall-clock budget adapts
the work, and a JSON line is emitted even on partial runs.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

BASELINE_KF_PER_S = 400.0 / 35.85
TOTAL_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 480))
MODE = os.environ.get("BENCH_MODE", "batch")


def emit(value, vs, extra=None):
    if extra:
        print(json.dumps(extra), file=sys.stderr)
    print(json.dumps({
        "metric": "keyframes_per_s",
        "value": round(value, 3),
        "unit": "kf/s",
        "vs_baseline": round(vs, 3),
    }))


def _workload(cfg, num_frames):
    from slslam_tpu.sim import (StereoLineRenderer, house_segments,
                                wave_trajectory)
    segs = house_segments()
    poses_gt = wave_trajectory(num_frames=400)[:num_frames]
    ren = StereoLineRenderer(segs, cfg.camera, noise_px=0.2, seed=4)
    frames = [ren.observe(T) for T in poses_gt]
    return frames, poses_gt


def _ate(traj, poses_gt):
    """Mean position error vs ground truth, both rooted at frame 0
    (calc_traj_err.m:27-40 semantics)."""
    import numpy as np
    T0 = poses_gt[0]
    err = []
    for T_est, T_gt in zip(traj, poses_gt):
        gt_cw = (T_gt @ T0.inv()).inv()
        err.append(np.linalg.norm(T_est.t - gt_cw.t))
    return float(np.mean(err))


def bench_batch(platform, t_start):
    """Whole-sequence replay on device: one dispatch, one fetch."""
    from slslam_tpu.config import SlamConfig
    from slslam_tpu.engine.batch import BatchSlam

    num_frames = 400  # the reference benchmark's own length
    cfg = dataclasses.replace(
        SlamConfig(),
        compute_dtype="float64" if platform == "cpu" else "float32",
        kf_rot_thr=1e-9, kf_tr_thr=1e-9)
    frames, poses_gt = _workload(cfg, num_frames)

    eng = BatchSlam(cfg)
    # cold run: jit compile + execute (compile dominated)
    t0 = time.perf_counter()
    res = eng.run(frames)
    cold_s = time.perf_counter() - t0
    nkf = res.kf_count
    if nkf == 0:
        emit(0.0, 0.0, {"error": "no keyframes", "platform": platform})
        return

    # warm runs: steady-state throughput (the number a resident service
    # sees; compile is a one-time cost cached by XLA).  cold_s is compile-
    # dominated, so it badly overestimates a warm run; after the first warm
    # run the real cost is known.
    walls = []
    est = 0.15 * cold_s + 10.0
    while (time.perf_counter() - t_start) + est < TOTAL_BUDGET_S \
            and len(walls) < 3:
        t0 = time.perf_counter()
        res = eng.run(frames)
        walls.append(time.perf_counter() - t0)
        est = 1.1 * min(walls)
    warm_s = min(walls) if walls else cold_s

    kf_per_s = nkf / warm_s
    emit(kf_per_s, kf_per_s / BASELINE_KF_PER_S, {
        "platform": platform,
        "mode": "batch",
        "keyframes": nkf,
        "cold_s": round(cold_s, 2),
        "warm_s": round(warm_s, 3),
        "warm_runs": len(walls),
        "ate_m": round(_ate(res.trajectory, poses_gt), 4),
        "avg_ba_iterations": round(res.stats["avg_num_iterations"], 2),
        "avg_final_cost": res.stats["avg_final_cost"],
        "num_landmarks": res.stats["num_landmarks"],
    })


def bench_interactive(platform, t_start):
    """Per-frame host loop (the reference's operating mode)."""
    from slslam_tpu.config import SlamConfig
    from slslam_tpu.engine import Slam

    num_frames = 110
    warmup_frames = 25
    cfg = dataclasses.replace(
        SlamConfig(),
        compute_dtype="float64" if platform == "cpu" else "float32",
        kf_rot_thr=1e-9, kf_tr_thr=1e-9,
        obs_buckets=(2048,), cam_buckets=(48,), line_buckets=(128,),
        corr_buckets=(128,))
    frames, _ = _workload(cfg, num_frames)

    slam = Slam(cfg)
    for i in range(warmup_frames):
        slam.process_frame(frames[i], i)
        if time.perf_counter() - t_start > 0.7 * TOTAL_BUDGET_S:
            warmup_frames = i + 1
            break

    kf0 = len(slam.state.kfs)
    frame_times = []
    measured_end = warmup_frames
    for i in range(warmup_frames, num_frames):
        t0 = time.perf_counter()
        slam.process_frame(frames[i], i)
        frame_times.append(time.perf_counter() - t0)
        measured_end = i + 1
        if time.perf_counter() - t_start > 0.95 * TOTAL_BUDGET_S:
            break
    nkf = len(slam.state.kfs) - kf0

    if nkf == 0 or not frame_times:
        emit(0.0, 0.0, {"error": "no keyframes measured",
                        "platform": platform})
        return

    import numpy as np
    # median frame time = steady-state rate, robust against one-time jit
    # compiles that land inside the measured window on slow backends
    median_t = float(np.median(frame_times))
    kf_per_s = 1.0 / median_t
    mean_rate = nkf / float(np.sum(frame_times))
    stats = slam.post_processing()
    emit(kf_per_s, kf_per_s / BASELINE_KF_PER_S, {
        "platform": platform,
        "mode": "interactive",
        "mean_rate_kf_s": round(mean_rate, 3),
        "median_frame_ms": round(median_t * 1e3, 1),
        "ba_mean_ms": stats["proc_local_ba_mean_s"] * 1e3,
        "vo_mean_ms": stats["proc_pose_estimation_mean_s"] * 1e3,
        "avg_ba_iterations": stats["avg_num_iterations"],
        "keyframes": nkf,
        "measured_frames": measured_end - warmup_frames,
    })


def main():
    t_start = time.perf_counter()
    import jax

    platform = jax.devices()[0].platform
    if platform == "cpu":
        jax.config.update("jax_enable_x64", True)

    if MODE == "interactive":
        bench_interactive(platform, t_start)
    else:
        bench_batch(platform, t_start)


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # never exit silently: the driver records this
        emit(0.0, 0.0, {"error": repr(exc)})
