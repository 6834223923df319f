"""Throughput benchmark — prints ONE JSON line for the driver.

Measures the flagship pipeline (batched ragged MFCC-13, 16 kHz,
25 ms / 10 ms) on whatever accelerator JAX finds (TPU v5e under the
driver), with inputs resident in device memory — the serving-path
convention: ingestion is pipelined/overlapped in the corpus runner, and
the chip-side pipeline is what the north-star metric targets.

Metric: audio-seconds of input processed per wall-second per chip.
Baseline (BASELINE.md): 10,000 audio-sec/s/chip -> vs_baseline = value/1e4.
Also reports max abs feature error vs the float64 oracle as a gate.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64, help="utterances/batch")
    ap.add_argument("--seconds", type=float, default=10.0,
                    help="audio seconds per utterance")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes for CPU smoke runs")
    ap.add_argument("--algo", default="auto",
                    choices=("auto", "direct", "directc", "dit2", "dit2c",
                             "dit4c"),
                    help="DFT factorization (cfg.dft_algorithm)")
    args = ap.parse_args()

    import jax
    if jax.default_backend() == "tpu":
        # TPU-only: the relay's remote compiler also writes CPU AOT entries
        # built for ITS host CPU; loading those here risks SIGILL
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from mfcc_tpu import FeatureConfig, oracle
    from mfcc_tpu.models import mfcc as mfcc_model

    if args.small:
        args.batch, args.seconds, args.iters = 4, 2.0, 3

    cfg = FeatureConfig(dft_algorithm=args.algo)
    sr = cfg.sample_rate
    n = int(args.seconds * sr)
    rng = np.random.default_rng(0)
    # speech-like content (tones+noise): exercises real dynamic range
    t = np.arange(n) / sr
    base = (0.3 * np.sin(2 * np.pi * 180 * t)
            + 0.1 * np.sin(2 * np.pi * 1200 * t)).astype(np.float32)
    audio = np.tile(base, (args.batch, 1))
    audio += 0.02 * rng.standard_normal(audio.shape).astype(np.float32)
    lengths = np.full((args.batch,), n, np.int32)

    dev = jax.devices()[0]
    audio_d = jax.device_put(jnp.asarray(audio), dev)
    lengths_d = jax.device_put(jnp.asarray(lengths), dev)

    # accuracy gate on one utterance (same compiled graph shapes not needed)
    feat_b, flens, _ = mfcc_model.mfcc_batch_jit(audio_d, lengths_d, cfg)
    got = np.asarray(feat_b[0])
    want = oracle.mfcc(audio[0].astype(np.float64), cfg)
    max_err = float(np.abs(got[: want.shape[0]] - want).max())

    # warmup already compiled above; timed loop
    jax.block_until_ready(feat_b)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        feat_b, flens, mask = mfcc_model.mfcc_batch_jit(
            audio_d, lengths_d, cfg)
    jax.block_until_ready(feat_b)
    dt = time.perf_counter() - t0

    audio_sec = args.batch * args.seconds * args.iters
    aps = audio_sec / dt
    n_chips = 1  # single-device bench; scaling measured separately
    value = aps / n_chips
    print(json.dumps({
        "metric": "audio_seconds_per_s_per_chip",
        "value": round(value, 1),
        "unit": "audio-sec/s/chip",
        "vs_baseline": round(value / 10_000.0, 3),
        "max_abs_error_vs_oracle": max_err,
        "batch": args.batch,
        "utt_seconds": args.seconds,
        "iters": args.iters,
        "wall_s": round(dt, 4),
        "device": str(dev),
    }))


if __name__ == "__main__":
    main()
