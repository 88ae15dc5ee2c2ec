"""On-chip measurement probe for the round's perf surfaces.

Each subcommand measures one surface and prints one JSON line, so a tunnel
wedge mid-list loses only that surface (CLAUDE.md: the TPU tunnel
intermittently wedges; run probes in background with generous timeouts).

    python tools/tpu_probe.py replay     # batch replay + refine breakdown
    python tools/tpu_probe.py assembly   # scatter vs onehot vs pallas
    python tools/tpu_probe.py pallas     # compiled (not interpret) kernel
Add --cpu to sanity-check the harness off-chip.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def probe_replay(args):
    """House-400 batch replay + global refine, per-stage walls."""
    import jax
    from slslam_tpu.config import SlamConfig
    from slslam_tpu.engine.batch import BatchSlam
    from slslam_tpu.engine.refine import global_refine
    from slslam_tpu.sim import (StereoLineRenderer, house_segments,
                                wave_trajectory)

    platform = jax.devices()[0].platform
    cfg = dataclasses.replace(
        SlamConfig(),
        compute_dtype="float64" if platform == "cpu" else "float32",
        kf_rot_thr=1e-9, kf_tr_thr=1e-9)
    segs = house_segments()
    poses_gt = wave_trajectory(num_frames=400)

    def workload(seed):
        ren = StereoLineRenderer(segs, cfg.camera, noise_px=0.2, seed=seed)
        return [ren.observe(T) for T in poses_gt]

    eng = BatchSlam(cfg)
    frames = workload(4)
    t0 = time.perf_counter()
    res = eng.run(frames)
    cold_replay = time.perf_counter() - t0
    t0 = time.perf_counter()
    ref = global_refine(frames, res.is_kf, res.trajectory, config=cfg)
    cold_refine = time.perf_counter() - t0

    rows = []
    for seed in (4, 5, 6):
        frames = workload(seed)
        t0 = time.perf_counter()
        res = eng.run(frames)
        t1 = time.perf_counter()
        ref = global_refine(frames, res.is_kf, res.trajectory, config=cfg)
        t2 = time.perf_counter()
        rows.append({"seed": seed, "replay_s": round(t1 - t0, 3),
                     "refine_s": round(t2 - t1, 3),
                     "kf_per_s": round(res.kf_count / (t2 - t0), 1)})
    _emit(probe="replay", platform=platform,
          cold_replay_s=round(cold_replay, 1),
          cold_refine_s=round(cold_refine, 1), warm=rows)


def probe_assembly(args):
    """local_ba assembly variants at the batch-window scale and a larger
    refine-like scale (VERDICT r2 item 6)."""
    import jax
    import jax.numpy as jnp
    from slslam_tpu.config import SlamConfig
    from slslam_tpu.ops.schur_ba import local_ba

    platform = jax.devices()[0].platform
    cfg = SlamConfig()
    jax.config.update("jax_default_matmul_precision", "highest")
    dtype = jnp.float64 if platform == "cpu" else jnp.float32
    rng = np.random.default_rng(0)

    scales = [
        # (C, L, O): the batch engine's windowed solve (Wn=20, Lp=129,
        # Wn*Om=2560) and a refine-scale instance
        ("window", 20, 129, 2560),
        ("refine", 128, 512, 16384),
    ]
    out = {}
    for name, C, L, O in scales:
        cam = jnp.asarray(rng.normal(0, 0.1, (C, 6)), dtype)
        line = jnp.asarray(
            np.concatenate([rng.normal(0, 0.5, (L, 3)),
                            rng.uniform(0.3, 1.2, (L, 1))], axis=1), dtype)
        obs = jnp.asarray(rng.normal(0, 0.3, (O, 8)), dtype)
        ocam = jnp.asarray(rng.integers(0, C, O), jnp.int32)
        olin = jnp.asarray(rng.integers(0, L, O), jnp.int32)
        ovalid = jnp.asarray(rng.random(O) < 0.9)
        cfree = jnp.ones(C, bool).at[0].set(False)
        lfree = jnp.ones(L, bool)
        for mode in ("scatter", "onehot", "pallas"):
            try:
                fn = lambda: local_ba(cam, line, obs, ocam, olin, ovalid,
                                      cfree, lfree, cfg.camera.baseline,
                                      cfg.huber_delta, robust=True,
                                      max_iters=10, assembly=mode)
                t0 = time.perf_counter()
                jax.block_until_ready(fn())
                compile_s = time.perf_counter() - t0
                reps = 5
                t0 = time.perf_counter()
                for _ in range(reps):
                    jax.block_until_ready(fn())
                warm_ms = (time.perf_counter() - t0) / reps * 1e3
                out[f"{name}_{mode}"] = {"compile_s": round(compile_s, 1),
                                         "warm_ms": round(warm_ms, 2)}
            except Exception as exc:
                out[f"{name}_{mode}"] = {"error": repr(exc)[:200]}
    _emit(probe="assembly", platform=platform, **out)


def probe_pallas(args):
    """Run the Pallas assembly kernel compiled (not interpret) and check
    numerics vs scatter (VERDICT r2 weak #6)."""
    import jax
    import jax.numpy as jnp
    from slslam_tpu.ops.pallas_kernels import assemble_pallas

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(1)
    O, C, L = 2048, 20, 129
    dtype = jnp.float32
    A = jnp.asarray(rng.normal(0, 1, (O, 6, 6)), dtype)
    B = jnp.asarray(rng.normal(0, 1, (O, 4, 4)), dtype)
    Wb = jnp.asarray(rng.normal(0, 1, (O, 6, 4)), dtype)
    gc_o = jnp.asarray(rng.normal(0, 1, (O, 6)), dtype)
    gl_o = jnp.asarray(rng.normal(0, 1, (O, 4)), dtype)
    ocam = jnp.asarray(rng.integers(0, C, O), jnp.int32)
    olin = jnp.asarray(rng.integers(0, L, O), jnp.int32)

    f = jax.jit(lambda: assemble_pallas(A, B, Wb, gc_o, gl_o, ocam, olin,
                                        C, L))
    t0 = time.perf_counter()
    outs = jax.block_until_ready(f())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(f())
    warm_ms = (time.perf_counter() - t0) / 10 * 1e3

    Hcc_ref = jnp.zeros((C, 6, 6), dtype).at[ocam].add(A)
    err = float(jnp.max(jnp.abs(outs[0] - Hcc_ref)))
    _emit(probe="pallas", platform=platform, compile_s=round(compile_s, 1),
          warm_ms=round(warm_ms, 2), hcc_max_abs_err=err)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["replay", "assembly", "pallas"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    from slslam_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache()

    {"replay": probe_replay, "assembly": probe_assembly,
     "pallas": probe_pallas}[args.cmd](args)


if __name__ == "__main__":
    main()
