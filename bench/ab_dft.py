"""On-device A/B of DFT factorizations (VERDICT r1 item 2).

Runs the flagship batched MFCC-13 pipeline with each dft_algorithm
back-to-back in ONE process (same device, same relay session), many
repeats, and reports per-repeat and median audio-sec/s/chip so relay
variance can't hide the winner.  Results land in bench/ab_dft.json and
decide the `auto` default (config.py dft_algorithm).

Usage:  python bench/ab_dft.py [--iters 100] [--repeats 7]
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
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--repeats", type=int, default=7)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--algos", nargs="+", default=["direct", "dit2"])
    # The DFT-algorithm knob only affects the XLA spectral stage; under
    # backend=auto the TPU routes to the fused Pallas kernel, which would
    # measure the SAME program for every algo.  Force xla by default.
    ap.add_argument("--backend", default="xla",
                    choices=("auto", "xla", "pallas"))
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "ab_dft.json"))
    args = ap.parse_args()

    import jax
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from mfcc_tpu import FeatureConfig, oracle
    from mfcc_tpu.models import mfcc as mfcc_model

    sr = 16_000
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

    results = {}
    for algo in args.algos:
        cfg = FeatureConfig(dft_algorithm=algo).validate()
        t_c0 = time.perf_counter()
        feat, flens, mask = mfcc_model.mfcc_batch_jit(
            audio_d, lengths_d, cfg, args.backend)
        jax.block_until_ready(feat)
        compile_s = time.perf_counter() - t_c0
        got = np.asarray(feat[0])
        want = oracle.mfcc(audio[0].astype(np.float64), cfg)
        max_err = float(np.abs(got[: want.shape[0]] - want).max())

        reps = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                feat, flens, mask = mfcc_model.mfcc_batch_jit(
                    audio_d, lengths_d, cfg, args.backend)
            # force completion with a host fetch: through the axon relay
            # block_until_ready alone has been observed to return before
            # queued work drains for some programs (bench/kernel_probe r2)
            np.asarray(feat[0, 0, 0])
            reps.append(audio_sec / (time.perf_counter() - t0))
        results[algo] = {
            "backend": args.backend,
            "audio_sec_per_s": [round(r, 1) for r in reps],
            "median": round(statistics.median(reps), 1),
            "max": round(max(reps), 1),
            "min": round(min(reps), 1),
            "max_abs_error_vs_oracle": max_err,
            "compile_or_cache_load_s": round(compile_s, 2),
        }
        print(json.dumps({"algo": algo, **results[algo]}), flush=True)

    medians = {a: results[a]["median"] for a in results}
    winner = max(medians, key=medians.get)
    out = {
        "device": str(dev),
        "batch": args.batch, "utt_seconds": args.seconds,
        "iters": args.iters, "repeats": args.repeats,
        "results": results,
        "winner_by_median": winner,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"winner_by_median": winner, "medians": medians}))


if __name__ == "__main__":
    main()
