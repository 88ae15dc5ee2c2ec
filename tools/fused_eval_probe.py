"""On-chip shootout: fused Pallas evaluate vs the XLA _eval_system at the
batch engine's window shape (VERDICT r3 item 8).

Measures compile wall and warm per-call wall for both lowerings of the
same computation (residual + Jacobians + robust weights + block outer
products + assembly), using scalar-fetch sync (see tools/mxu_util.py).

Usage:  python tools/fused_eval_probe.py [--chunk 256] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--C", type=int, default=20)
    ap.add_argument("--L", type=int, default=129)
    ap.add_argument("--O", type=int, default=2560)
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from slslam_tpu.ops import pallas_kernels as pk
    from slslam_tpu.ops.schur_ba import _eval_system

    platform = jax.devices()[0].platform
    dtype = jnp.float64 if platform == "cpu" else jnp.float32
    C, L, O = args.C, args.L, args.O
    rng = np.random.default_rng(0)
    cam = jnp.asarray(rng.standard_normal((C, 6)) * 0.1, dtype)
    line = rng.standard_normal((L, 4)) * 0.2
    line[:, 3] = 0.4 + 0.3 * rng.random(L)
    line = jnp.asarray(line, dtype)
    obs = jnp.asarray(rng.standard_normal((O, 8)) * 0.3, dtype)
    oc = jnp.asarray(rng.integers(0, C, O), jnp.int32)
    ol = jnp.asarray(rng.integers(0, L, O), jnp.int32)
    wv = jnp.asarray((rng.random(O) < 0.8).astype(np.float64), dtype)
    cfree = jnp.asarray(np.ones(C), dtype)
    lfree = jnp.asarray(np.ones(L), dtype)
    bl = jnp.asarray(0.12, dtype)
    hd = jnp.asarray(1 / 406.05, dtype)

    def sync(out):
        jax.device_get(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

    def bench(fn, reps=30):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(out)
        return compile_s, (time.perf_counter() - t0) / reps

    xla = jax.jit(lambda: _eval_system(cam, line, obs, oc, ol, wv, cfree,
                                       lfree, bl, hd, True,
                                       assembly="onehot"))
    fused = jax.jit(lambda: pk.fused_eval_pallas(
        cam, line, obs, oc, ol, wv, cfree, lfree, bl, hd,
        chunk=args.chunk))

    cx, wx = bench(xla)
    try:
        cf, wf = bench(fused)
        # numeric check on chip
        a = jax.device_get(xla())
        b = jax.device_get(fused())
        err = max(float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
                  for x, y in zip(a, b))
        ok = True
    except Exception as exc:
        cf = wf = err = None
        ok = repr(exc)[:200]
    print(json.dumps({
        "platform": platform, "C": C, "L": L, "O": O,
        "chunk": args.chunk,
        "xla_compile_s": round(cx, 1), "xla_warm_ms": round(wx * 1e3, 3),
        "pallas_compile_s": round(cf, 1) if cf is not None else None,
        "pallas_warm_ms": (round(wf * 1e3, 3) if wf is not None
                           else None),
        "max_abs_diff": err, "pallas_ok": ok,
    }))


if __name__ == "__main__":
    main()
