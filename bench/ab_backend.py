"""On-device A/B of execution backends (VERDICT r1 item 1).

Runs the flagship batched MFCC-13 pipeline with each backend
back-to-back in one process, many repeats, medians — same protocol as
ab_dft.py.  "pallas" resolves to the fused DIT kernel (kernels/fused_dit)
for the default config; "pallas-direct" forces the v1 direct kernel for
comparison.  Results decide backend.resolve("auto").

Usage:  python bench/ab_backend.py [--iters 100] [--repeats 7]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--repeats", type=int, default=7)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--modes", nargs="+",
                    default=["xla", "pallas", "pallas-direct"])
    ap.add_argument("--tile", type=int, default=128)
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
    from mfcc_tpu.ops.kernels import fused_dit, fused_mfcc

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
    audio_sec = args.batch * args.seconds * args.iters

    @partial(jax.jit, static_argnames=("kern", "tile"))
    def kernel_only(x, kern, tile):
        y = framing.preemphasize(x, cfg)
        if kern == "dit":
            return fused_dit.fused_features_dit(y, cfg, tile_t=tile)
        return fused_mfcc.fused_features(y, cfg, tile_t=tile)

    def run_mode(mode):
        if mode == "xla":
            def fn():
                f, _, _ = mfcc_model.mfcc_batch_jit(audio_d, lengths_d, cfg,
                                                    "xla")
                return f
        elif mode == "pallas":
            def fn():
                return kernel_only(audio_d, "dit", args.tile)
        elif mode == "pallas-direct":
            def fn():
                return kernel_only(audio_d, "direct", args.tile)
        else:
            raise ValueError(mode)
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        got = np.asarray(out[0])
        want = oracle.mfcc(audio[0].astype(np.float64), cfg)
        max_err = float(np.abs(got[: want.shape[0]] - want).max())
        reps = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn()
            jax.block_until_ready(out)
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
                   "utt_seconds": args.seconds, "iters": args.iters,
                   "repeats": args.repeats, "tile_t": args.tile,
                   "results": results, "winner_by_median": winner}, f,
                  indent=1)
    print(json.dumps({"winner_by_median": winner, "medians": medians}))


if __name__ == "__main__":
    main()
