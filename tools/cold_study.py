"""Cold-start study: compile wall vs XLA optimization-effort knobs.

Replicates bench.py's batch+refine cold path (the driver-visible cold
start: BENCH_r03.json cold_s=309.8 on a fresh checkout) with the
persistent cache disabled, under a given exec-time/memory-fitting effort,
and reports cold compile wall + warm per-seed wall so the compile-time /
runtime trade is measured, not guessed.

Usage:  python tools/cold_study.py [effort]     # e.g. -1.0; omit = default
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

os.environ["SLSLAM_CACHE_DIR"] = "0"   # fresh-HLO: no persistent cache

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    effort = float(sys.argv[1]) if len(sys.argv) > 1 else None
    t0 = time.perf_counter()
    import jax
    if effort is not None:
        jax.config.update("jax_exec_time_optimization_effort", effort)
        jax.config.update("jax_memory_fitting_effort", effort)
    platform = jax.devices()[0].platform
    t_init = time.perf_counter() - t0

    from slslam_tpu.config import SlamConfig
    from slslam_tpu.engine.batch import BatchSlam
    from slslam_tpu.engine.refine import global_refine
    from slslam_tpu.sim import (StereoLineRenderer, house_segments,
                                wave_trajectory)

    cfg = dataclasses.replace(
        SlamConfig(),
        compute_dtype="float64" if platform == "cpu" else "float32",
        kf_rot_thr=1e-9, kf_tr_thr=1e-9)

    def workload(seed):
        segs = house_segments()
        poses_gt = wave_trajectory(num_frames=400)
        ren = StereoLineRenderer(segs, cfg.camera, noise_px=0.2, seed=seed)
        return [ren.observe(T) for T in poses_gt], poses_gt

    frames, poses_gt = workload(4)
    eng = BatchSlam(cfg)

    t0 = time.perf_counter()
    res = eng.run(frames)
    t_scan = time.perf_counter() - t0
    t0 = time.perf_counter()
    ref = global_refine(frames, res.is_kf, res.trajectory, config=cfg)
    t_refine = time.perf_counter() - t0
    cold_s = t_scan + t_refine

    import numpy as np
    T0 = poses_gt[0]

    def ate(traj):
        err = [np.linalg.norm(T_est.t - (T_gt @ T0.inv()).inv().t)
               for T_est, T_gt in zip(traj, poses_gt)]
        return float(np.mean(err))

    # warm: 2 seeds, replay + refine each
    walls = []
    for seed in (5, 6):
        fr, _ = workload(seed)
        t0 = time.perf_counter()
        r = eng.run(fr)
        global_refine(fr, r.is_kf, r.trajectory, config=cfg)
        walls.append(time.perf_counter() - t0)

    print(json.dumps({
        "platform": platform, "effort": effort,
        "cold_scan_s": round(t_scan, 1),
        "cold_refine_s": round(t_refine, 1),
        "cold_s": round(cold_s, 1),
        "warm_per_seed_s": [round(w, 2) for w in walls],
        "kf_per_s_warm": round(2 * res.kf_count / sum(walls), 1),
        "ate_refined": round(ate(ref.trajectory), 4),
        "init_s": round(t_init, 1),
    }))


if __name__ == "__main__":
    main()
