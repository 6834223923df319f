"""On-device A/B of execution backends (VERDICT r1 item 1).

Runs the flagship batched MFCC-13 pipeline with each backend
back-to-back in one process, many repeats, medians.  Protocol is the
bench.py scan protocol (r2): K pipeline iterations inside ONE dispatch
via ``lax.scan`` serialized by a scalar carry, completion forced by a
host fetch — the old per-dispatch loop was floored at the relay's
~2-3 ms dispatch round-trip and measured nothing about the chip.

Modes:
- ``xla``           hop-block GEMM jnp pipeline (mfcc_batch backend=xla)
- ``pallas``        fused DIT kernel + its XLA-side prep (kernels/fused_dit)
- ``pallas-direct`` v1 direct hop-block kernel + prep (kernels/fused_mfcc)
- ``pallas-raw``    v3 raw-audio kernel, zero XLA prep (kernels/fused_raw)
- ``pallas-raw-dit`` v4 radix-2 DIT on the raw layout (kernels/fused_raw_dit)
- ``pallas-raw-dit-m`` v5: v4 with the 16 per-phase GEMMs merged into one
  (P*fpp, L) GEMM per parity via VMEM frame-block assembly

Results decide backend.resolve("auto").

Usage:  python bench/ab_backend.py [--scan 20] [--iters 5] [--repeats 7]
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
    ap.add_argument("--scan", type=int, default=20,
                    help="pipeline iterations per dispatch (lax.scan)")
    ap.add_argument("--iters", type=int, default=5,
                    help="dispatches per timed repeat")
    ap.add_argument("--repeats", type=int, default=7)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--modes", nargs="+",
                    default=["xla", "pallas", "pallas-raw"])
    ap.add_argument("--tile", type=int, default=None,
                    help="kernel tile_t override (default: adaptive)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "ab_backend.json"))
    args = ap.parse_args()

    import jax
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from functools import partial

    from mfcc_tpu import FeatureConfig, oracle
    from mfcc_tpu.models import mfcc as mfcc_model
    from mfcc_tpu.ops import framing
    from mfcc_tpu.ops.kernels import (fused_dit, fused_mfcc, fused_raw,
                                      fused_raw_dit)

    cfg = FeatureConfig().validate()
    sr = cfg.sample_rate
    n = int(args.seconds * sr)
    rng = np.random.default_rng(0)
    t = np.arange(n) / sr
    base = (0.3 * np.sin(2 * np.pi * 180 * t)
            + 0.1 * np.sin(2 * np.pi * 1200 * t)).astype(np.float32)
    audio = np.tile(base, (args.batch, 1))
    audio += 0.02 * rng.standard_normal(audio.shape).astype(np.float32)
    lengths = np.full((args.batch,), n, np.int32)

    dev = jax.devices()[0]
    audio_d = jax.device_put(jnp.asarray(audio), dev)
    lengths_d = jax.device_put(jnp.asarray(lengths), dev)
    interp = jax.default_backend() != "tpu"

    def pipeline(mode):
        """One full-pipeline invocation as a jittable x -> features fn."""
        if mode == "xla":
            def fn(x):
                f, _, _ = mfcc_model.mfcc_batch(x, lengths_d, cfg, "xla")
                return f
        elif mode == "pallas":
            def fn(x):
                y = framing.preemphasize(x, cfg)
                return fused_dit.fused_features_dit(y, cfg, tile_t=args.tile,
                                                    interpret=interp)
        elif mode == "pallas-direct":
            def fn(x):
                y = framing.preemphasize(x, cfg)
                return fused_mfcc.fused_features(
                    y, cfg, tile_t=args.tile or 128, interpret=interp)
        elif mode == "pallas-raw":
            def fn(x):
                return fused_raw.fused_features_raw(x, cfg, tile_t=args.tile,
                                                    interpret=interp)
        elif mode == "pallas-raw-m":
            def fn(x):
                return fused_raw.fused_features_raw(
                    x, cfg, tile_t=args.tile, merged=True, interpret=interp)
        elif mode == "pallas-raw-dit":
            def fn(x):
                return fused_raw_dit.fused_features_raw_dit(
                    x, cfg, tile_t=args.tile, interpret=interp)
        elif mode == "pallas-raw-dit-m":
            def fn(x):
                return fused_raw_dit.fused_features_raw_dit(
                    x, cfg, tile_t=args.tile, merged=True, interpret=interp)
        elif mode == "pallas-raw-dit-m-h":
            def fn(x):
                return fused_raw_dit.fused_features_raw_dit(
                    x, cfg, tile_t=args.tile, merged=True, half=True,
                    interpret=interp)
        elif mode == "pallas-raw-dit-m-pm":
            def fn(x):
                return fused_raw_dit.fused_features_raw_dit(
                    x, cfg, tile_t=args.tile, merged=True, pm_out=True,
                    interpret=interp)
        else:
            raise ValueError(mode)
        return fn

    def scanned(fn):
        def g():
            def body(carry, _):
                out = fn(audio_d + carry)
                return (out.ravel()[0] * jnp.float32(1e-30)).astype(
                    audio_d.dtype), None
            c, _ = jax.lax.scan(body, jnp.zeros((), audio_d.dtype), None,
                                length=args.scan)
            return c
        return jax.jit(g)

    audio_sec = args.batch * args.seconds * args.scan * args.iters
    want = oracle.mfcc(audio[0].astype(np.float64), cfg)

    def run_mode(mode):
        fn = pipeline(mode)
        # accuracy gate (single dispatch)
        got = np.asarray(jax.jit(fn)(audio_d)[0])
        max_err = float(np.abs(got[: want.shape[0], : want.shape[1]]
                               - want).max())
        g = scanned(fn)
        t0 = time.perf_counter()
        np.asarray(g())            # compile + warm the d2h path
        compile_s = time.perf_counter() - t0
        reps = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = None
            for _ in range(args.iters):
                out = g()
            np.asarray(out)        # force completion (relay-safe)
            reps.append(audio_sec / (time.perf_counter() - t0))
        return {
            "audio_sec_per_s": [round(r, 1) for r in reps],
            "median": round(statistics.median(reps), 1),
            "max": round(max(reps), 1), "min": round(min(reps), 1),
            "max_abs_error_vs_oracle": max_err,
            "compile_or_cache_load_s": round(compile_s, 2),
        }

    results = {}
    for mode in args.modes:
        results[mode] = run_mode(mode)
        print(json.dumps({"mode": mode, **results[mode]}), flush=True)

    medians = {m: results[m]["median"] for m in results}
    winner = max(medians, key=medians.get)
    with open(args.out, "w") as f:
        json.dump({"device": str(dev), "batch": args.batch,
                   "utt_seconds": args.seconds, "scan": args.scan,
                   "iters": args.iters, "repeats": args.repeats,
                   "tile_t": args.tile, "protocol": "scan-carry-v2",
                   "results": results, "winner_by_median": winner}, f,
                  indent=1)
    print(json.dumps({"winner_by_median": winner, "medians": medians}))


if __name__ == "__main__":
    main()
