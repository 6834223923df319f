"""On-device A/B: the matmul-precision ladder through the v5 kernel.

The accuracy contract pins the default at HIGHEST (bf16x6 f32
emulation); `matmul_precision="high"` (bf16x3) and "default" (one bf16
pass) are documented opt-in fast modes for NN-training features where
1e-3-class error is acceptable (config.py).  r1 measured the ladder on
the XLA path (x3: 302k vs x6: 246k — only 1.2x, XLA is not purely
MXU-bound); the v5 kernel IS GEMM-chain-bound (bench/roofline.json), so
the ladder's win should be larger there.  This measures it and records
the error alongside — the speed/accuracy trade as one committed
artifact.

Writes bench/ab_precision.json.
Usage: python bench/ab_precision.py [--scan 10] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", type=int, default=10)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "ab_precision.json"))
    args = ap.parse_args()

    import jax
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from mfcc_tpu import FeatureConfig, oracle
    from mfcc_tpu.models import mfcc as mfcc_model

    sr = 16000
    n = int(args.seconds * sr)
    B = args.batch
    rng = np.random.default_rng(0)
    t = np.arange(n) / sr
    base = (0.3 * np.sin(2 * np.pi * 180 * t)
            + 0.1 * np.sin(2 * np.pi * 1200 * t)).astype(np.float32)
    audio = np.tile(base, (B, 1)) + 0.02 * rng.standard_normal(
        (B, n)).astype(np.float32)
    lengths = np.full((B,), n, np.int32)
    dev = jax.devices()[0]
    ad = jax.device_put(jnp.asarray(audio), dev)
    ld = jax.device_put(jnp.asarray(lengths), dev)
    want = oracle.mfcc(audio[0].astype(np.float64), FeatureConfig())

    def scanned(cfg, bk):
        def g():
            def body(carry, _):
                f, _, _ = mfcc_model.mfcc_batch(ad + carry, ld, cfg, bk)
                return (f.ravel()[0] * jnp.float32(1e-30)).astype(
                    ad.dtype), None
            c, _ = jax.lax.scan(body, jnp.zeros((), ad.dtype), None,
                                length=args.scan)
            return c
        return jax.jit(g)

    audio_sec = B * args.seconds * args.scan * args.iters
    results = {}
    # Mosaic has no in-kernel HIGH (bf16x3) dot lowering (backend.py
    # kernel_precision_supported) — 'high' configs route to the XLA path
    # automatically; ladder measured where each precision actually runs.
    for prec, bk in (("highest", "pallas"), ("default", "pallas"),
                     ("highest", "xla"), ("high", "xla")):
        cfg = FeatureConfig(matmul_precision=prec).validate()
        f, fl, _ = mfcc_model.mfcc_batch_jit(ad, ld, cfg, bk)
        err = float(np.abs(np.asarray(f[0])[: int(fl[0])] - want).max())
        g = scanned(cfg, bk)
        t0 = time.perf_counter()
        np.asarray(g())
        compile_s = time.perf_counter() - t0
        reps = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = None
            for _ in range(args.iters):
                out = g()
            np.asarray(out)
            reps.append(audio_sec / (time.perf_counter() - t0))
        key = f"{bk}-{prec}"
        results[key] = {
            "audio_sec_per_s": [round(r, 1) for r in reps],
            "median": round(statistics.median(reps), 1),
            "max_abs_error_vs_oracle": err,
            "compile_or_cache_load_s": round(compile_s, 2),
        }
        print(json.dumps({"mode": key, **results[key]}), flush=True)

    with open(args.out, "w") as f:
        json.dump({"device": str(dev), "batch": B,
                   "utt_seconds": args.seconds, "scan": args.scan,
                   "iters": args.iters, "repeats": args.repeats,
                   "protocol": "scan-carry-v2",
                   "note": "v5 merged raw-DIT kernel; 'highest' is the "
                           "1e-4-contract default, the others are "
                           "documented opt-in fast modes (config.py)",
                   "results": results}, f, indent=1)
    print(json.dumps({p: results[p]["median"] for p in results}))


if __name__ == "__main__":
    main()
