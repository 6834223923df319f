"""On-device A/B: PLP spectral front half through the v5 raw-DIT kernel
(projection="bark") vs the XLA hop-block path (VERDICT r3 #3).

Both run the identical LPC back half on the (B, T, n_bark) tensor; the
contender replaces preemph + hop-block DFT GEMMs + bark GEMM + log with
ONE fused Pallas kernel (VMEM-resident spectra — the v3->v5 playbook).
Accuracy is reported for both against the float64 oracle on lane 0.

Protocol: bench.py scan-carry-v2.  Writes bench/ab_plp.json.

Usage: python bench/ab_plp.py [--scan 10] [--iters 5] [--repeats 5]
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
        os.path.dirname(__file__), "ab_plp.json"))
    args = ap.parse_args()

    import jax
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from mfcc_tpu import FeatureConfig, oracle
    from mfcc_tpu.models import plp as plp_model

    cfg = FeatureConfig().validate()
    sr = cfg.sample_rate
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

    want = oracle.plp(audio[0].astype(np.float64), cfg)

    def scanned(backend):
        def g():
            def body(carry, _):
                f, _, _ = plp_model.plp_batch(ad + carry, ld, cfg, backend)
                return (f.ravel()[0] * jnp.float32(1e-30)).astype(ad.dtype), None
            c, _ = jax.lax.scan(body, jnp.zeros((), ad.dtype), None,
                                length=args.scan)
            return c
        return jax.jit(g)

    audio_sec = B * args.seconds * args.scan * args.iters
    results = {}
    for backend in ("xla", "pallas"):
        f, fl, _ = plp_model.plp_batch_jit(ad, ld, cfg, backend)
        err = float(np.abs(np.asarray(f[0])[: int(fl[0])] - want).max())
        g = scanned(backend)
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
        results[backend] = {
            "audio_sec_per_s": [round(r, 1) for r in reps],
            "median": round(statistics.median(reps), 1),
            "max_abs_error_vs_oracle": err,
            "compile_or_cache_load_s": round(compile_s, 2),
        }
        print(json.dumps({"backend": backend, **results[backend]}),
              flush=True)

    with open(args.out, "w") as f:
        json.dump({"device": str(dev), "batch": B,
                   "utt_seconds": args.seconds, "scan": args.scan,
                   "iters": args.iters, "repeats": args.repeats,
                   "protocol": "scan-carry-v2", "results": results}, f,
                  indent=1)
    print(json.dumps({b: results[b]["median"] for b in results}))


if __name__ == "__main__":
    main()
