"""MXU-utilization measurement for the dense solve surfaces (VERDICT r3
item 7): achieved FLOP/s + memory traffic per headline kernel, against a
measured same-chip matmul ceiling, so each surface's roofline position is
stated from data rather than guessed.

Surfaces:
  * dense window local_ba   (C=20,  L=129, O=2560  — the scan's per-frame BA)
  * dense refine local_ba   (C=128, L=512, O=16384 — refine-scale dense)
  * onehot assembly alone   (the _eval_system instantiation local_ba uses)
  * matmul ceiling          (4096^3 f32 and bf16 — the chip's achievable peak)

FLOP counts come from XLA's own cost analysis of the compiled executable
(compiled.cost_analysis()), walls from block_until_ready timing, so
"achieved" means flops-the-compiler-scheduled / measured-wall.

Usage:  python tools/mxu_util.py [--cpu]
Prints one JSON line per surface.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(out):
    """Force completion with a 4-byte fetch: through the tunneled
    backend block_until_ready returns before device completion (a 4096^3
    matmul 'finished' in 57 us), and fetching a full result leaf times
    the tunnel's MB/s instead of the chip (64 MB at ~0.07 GB/s).  A
    device-side reduction to a scalar forces the producer to finish and
    costs one small transfer."""
    import jax
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(out)
    jax.device_get(jnp.sum(leaves[0]))


def _bench(fn, *args, reps=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def _cost(jitted, *args):
    try:
        c = jitted.lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", 0)), float(
            c.get("bytes accessed", c.get("bytes_accessed", 0)))
    except Exception:
        return 0.0, 0.0


def _emit(name, wall_s, flops, bytes_acc, extra=None):
    d = {
        "surface": name,
        "wall_ms": round(wall_s * 1e3, 3),
        "gflops": round(flops / 1e9, 3),
        "achieved_gflop_s": round(flops / wall_s / 1e9, 1) if wall_s else 0,
        "achieved_gb_s": round(bytes_acc / wall_s / 1e9, 1) if wall_s else 0,
    }
    if extra:
        d.update(extra)
    print(json.dumps(d))


def _ba_problem(rng, C, L, obs_per_cam, dtype):
    import jax.numpy as jnp
    O = C * obs_per_cam
    cam = rng.standard_normal((C, 6)) * 0.01
    line = rng.standard_normal((L, 4)) * 0.1
    line[:, 3] += 0.8
    obs = rng.standard_normal((O, 8)) * 0.3
    ocam = np.repeat(np.arange(C), obs_per_cam).astype(np.int32)
    olin = rng.integers(0, L, O).astype(np.int32)
    ovalid = np.ones(O, bool)
    cfree = np.ones(C, bool)
    cfree[0] = False
    lfree = np.ones(L, bool)
    return tuple(jnp.asarray(a, dtype) if a.dtype.kind == "f" else
                 jnp.asarray(a)
                 for a in (cam, line, obs, ocam, olin, ovalid, cfree,
                           lfree))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from slslam_tpu.utils.compcache import enable_persistent_cache
        enable_persistent_cache()
    import jax.numpy as jnp

    from slslam_tpu.ops.schur_ba import _eval_system, local_ba

    platform = jax.devices()[0].platform
    dtype = jnp.float64 if platform == "cpu" else jnp.float32
    print(json.dumps({"platform": platform, "dtype": str(dtype)}))
    rng = np.random.default_rng(0)

    # matmul ceiling: what this chip actually sustains on a big GEMM
    for mm_dtype, name in ((jnp.float32, "matmul_ceiling_f32"),
                           (jnp.bfloat16, "matmul_ceiling_bf16")):
        n = 4096
        a = jnp.asarray(rng.standard_normal((n, n)), mm_dtype)
        b = jnp.asarray(rng.standard_normal((n, n)), mm_dtype)
        mm = jax.jit(lambda x, y: x @ y)
        wall = _bench(mm, a, b)
        _emit(name, wall, 2.0 * n ** 3, 3 * n * n * np.dtype(
            "float32").itemsize)

    # dense window BA (the batch scan's per-frame instantiation)
    for label, C, L, opc in (("local_ba_window", 20, 129, 128),
                             ("local_ba_refine_dense", 128, 512, 128)):
        prob = _ba_problem(rng, C, L, opc, dtype)
        fn = lambda *a: local_ba(*a, jnp.asarray(0.12, dtype),
                                 jnp.asarray(1 / 406.05, dtype),
                                 robust=True, max_iters=args.iters,
                                 assembly="onehot")
        jfn = jax.jit(fn)
        wall = _bench(jfn, *prob)
        flops, bytes_acc = _cost(jfn, *prob)
        _emit(label, wall, flops, bytes_acc,
              {"C": C, "L": L, "O": C * opc, "lm_iters_cap": args.iters,
               "note": "flops = XLA whole-solve estimate (all LM iters)"})

    # BATCHED dense window BA: B independent window problems in one
    # vmapped solve (the r5 design fix for "the dense problems are
    # simply small" — the workload has abundant independent small
    # problems and one dispatch carries them all; engine/batch.py
    # dispatch_many / batch_lc._joint_polish_many are the production
    # instantiations).  Reported against the single-problem row above.
    from slslam_tpu.ops.schur_ba import local_ba_impl
    C, L, opc = 20, 129, 128
    for B in (8, 64):
        probs = [_ba_problem(np.random.default_rng(i), C, L, opc, dtype)
                 for i in range(B)]
        stacked = tuple(jnp.stack([p[k] for p in probs])
                        for k in range(8))

        def fn_many(*a):
            def one(c, l, o, oc, ol, ov, cf, lf):
                return local_ba_impl(c, l, o, oc, ol, ov, cf, lf,
                                     jnp.asarray(0.12, dtype),
                                     jnp.asarray(1 / 406.05, dtype),
                                     robust=True, max_iters=args.iters,
                                     assembly="blocked")
            return jax.vmap(one)(*a)

        jfn = jax.jit(fn_many)
        wall = _bench(jfn, *stacked, reps=5)
        flops, bytes_acc = _cost(jfn, *stacked)
        _emit(f"local_ba_window_batched_{B}", wall, flops, bytes_acc,
              {"B": B, "C": C, "L": L, "O": C * opc,
               "lm_iters_cap": args.iters,
               "note": "B independent window solves, one vmapped dispatch"})

    # onehot assembly alone (residual+jac+blocks, no solve)
    C, L, opc = 20, 129, 128
    cam, line, obs, ocam, olin, ovalid, cfree, lfree = _ba_problem(
        rng, C, L, opc, dtype)

    @jax.jit
    def assemble(cam, line, obs, ocam, olin, ovalid, cfree, lfree):
        return _eval_system(cam, line, obs, ocam, olin,
                            ovalid.astype(dtype), cfree.astype(dtype),
                            lfree.astype(dtype), jnp.asarray(0.12, dtype),
                            jnp.asarray(1 / 406.05, dtype), True,
                            assembly="onehot")

    wall = _bench(assemble, cam, line, obs, ocam, olin, ovalid, cfree,
                  lfree)
    flops, bytes_acc = _cost(assemble, cam, line, obs, ocam, olin, ovalid,
                             cfree, lfree)
    _emit("onehot_assembly", wall, flops, bytes_acc,
          {"C": C, "L": L, "O": C * opc})


if __name__ == "__main__":
    main()
