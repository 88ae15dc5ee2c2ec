"""Distributed scaling measurement for the BA and PGO solvers.

Measures wall-clock of `dist_local_ba_lines` / `dist_pose_graph_opt` at mesh sizes
1, 2, 4, 8 and reports scaling efficiency (the BASELINE.json target:
>= 80% frames/s efficiency at 2 hosts).  On real hardware, run under a pod
slice; in this environment the 8-device CPU mesh validates the sharding and
collective structure (CPU timings are not ICI timings — the structural
check is that per-device work halves while one psum per LM iteration is the
only communication).

Usage: python tools/scaling_bench.py [--obs 16384] [--cams 64] [--lines 512]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obs", type=int, default=16384)
    ap.add_argument("--cams", type=int, default=64)
    ap.add_argument("--lines", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    if not os.environ.get("XLA_FLAGS"):
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np
    from jax.sharding import Mesh

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax.numpy as jnp
    from __graft_entry__ import _example_ba_problem
    from slslam_tpu.parallel import dist_local_ba_lines, partition_by_line

    devices = jax.devices()
    print(f"devices: {len(devices)} x {devices[0].platform}")
    prob = _example_ba_problem(C=args.cams, L=args.lines, O=args.obs)
    (cam0, orth0, obs_a, oc_a, ol_a, ov_a, cf_a, lf_a, bl, hd) = prob

    results = {}
    n = 1
    while n <= len(devices):
        mesh = Mesh(np.array(devices[:n]), ("obs",))
        lo, lf, ob, oc, ol, ov, _ = partition_by_line(
            np.asarray(orth0), np.asarray(lf_a), np.asarray(obs_a),
            np.asarray(oc_a), np.asarray(ol_a), np.asarray(ov_a), n)
        sh = (jnp.asarray(lo), jnp.asarray(ob), jnp.asarray(oc),
              jnp.asarray(ol), jnp.asarray(ov), cf_a, jnp.asarray(lf))
        out = dist_local_ba_lines(mesh, cam0, *sh, bl, hd,
                                  robust=True, max_iters=args.iters)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = dist_local_ba_lines(mesh, cam0, *sh, bl, hd,
                                      robust=True, max_iters=args.iters)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        results[n] = dt

        # structural check: per-device FLOPs must scale ~1/n (the virtual
        # CPU mesh shares physical cores, so wall-clock efficiency is only
        # meaningful on real multi-chip hardware — FLOP sharding is the
        # hardware-independent signal)
        lowered = dist_local_ba_lines.lower(mesh, cam0, *sh, bl, hd,
                                            robust=True,
                                            max_iters=args.iters)
        cost = lowered.compile().cost_analysis()
        flops = (cost or {}).get("flops", float("nan"))

        eff = results[1] / (dt * n) if n > 1 else 1.0
        print(f"mesh={n}: {dt * 1e3:8.1f} ms/solve   wall-eff {eff:5.1%}   "
              f"per-device GFLOP {flops / 1e9:7.3f}")
        n *= 2


if __name__ == "__main__":
    main()
