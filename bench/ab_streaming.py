"""On-device A/B: serving dispatch through the fused kernel path
(VERDICT r3 #7) — process_chunks_batch_jit (K-step lax.scan of the XLA
engine per session) vs process_chunks_batch_fused (one v5 raw-DIT
kernel launch over the carry-prefixed K-chunk span).

Steady-state serving protocol: states are warmed past the startup
partial-frame region first, then the same (B, K, C) chunk tensor is
dispatched repeatedly inside a scan-carry loop (bench.py protocol; the
state threads through the scan, so consecutive iterations are real
consecutive serving steps, not replays).

Writes bench/ab_streaming.json.

Usage: python bench/ab_streaming.py [--sessions 64] [--chunks 15]
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
    ap.add_argument("--sessions", type=int, default=64)
    ap.add_argument("--chunks", type=int, default=15)
    ap.add_argument("--chunk-frames", type=int, default=64)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "ab_streaming.json"))
    args = ap.parse_args()

    import jax
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from mfcc_tpu import FeatureConfig
    from mfcc_tpu.models import streaming

    cfg = FeatureConfig().validate()
    sr = cfg.sample_rate
    B, K, CF = args.sessions, args.chunks, args.chunk_frames
    C = CF * cfg.hop_len
    rng = np.random.default_rng(0)
    t = np.arange(K * C) / sr
    base = (0.3 * np.sin(2 * np.pi * 180 * t)
            + 0.1 * np.sin(2 * np.pi * 1200 * t)).astype(np.float32)
    chunks = np.tile(base.reshape(1, K, C), (B, 1, 1))
    chunks += 0.02 * rng.standard_normal(chunks.shape).astype(np.float32)
    dev = jax.devices()[0]
    chunks_d = jax.device_put(jnp.asarray(chunks), dev)

    audio_sec_per_call = B * K * C / sr

    def warmed_state(step_fn):
        st = streaming.init_state_batch(B, cfg)
        st, _, _ = step_fn(st, chunks_d, cfg)
        return jax.tree.map(jax.block_until_ready, st)

    def scanned(step_fn, st0):
        def g(st):
            def body(carry, _):
                stc, feats, nv = step_fn(carry, chunks_d, cfg)
                return stc, feats.ravel()[0]
            stf, leaf = jax.lax.scan(body, st, None, length=args.scan)
            return stf, leaf[-1]
        return jax.jit(g), st0

    results = {}
    for name, fn in (("scan-xla", streaming.process_chunks_batch_jit),
                     ("fused-v5", streaming.process_chunks_batch_fused_jit)):
        st0 = warmed_state(fn)
        g, st = scanned(fn, st0)
        t0 = time.perf_counter()
        stf, leaf = g(st)
        np.asarray(leaf)
        compile_s = time.perf_counter() - t0
        audio_sec = audio_sec_per_call * args.scan * args.iters
        reps = []
        for _ in range(args.repeats):
            st_r = st0
            t0 = time.perf_counter()
            leaf = None
            for _ in range(args.iters):
                st_r, leaf = g(st_r)
            np.asarray(leaf)
            reps.append(audio_sec / (time.perf_counter() - t0))
        results[name] = {
            "audio_sec_per_s": [round(r, 1) for r in reps],
            "median": round(statistics.median(reps), 1),
            "compile_or_cache_load_s": round(compile_s, 2),
        }
        print(json.dumps({"mode": name, **results[name]}), flush=True)

    with open(args.out, "w") as f:
        json.dump({"device": str(dev), "sessions": B, "chunks_per_dispatch": K,
                   "chunk_frames": CF, "scan": args.scan,
                   "iters": args.iters, "repeats": args.repeats,
                   "protocol": "scan-carry-v2 (state-threaded)",
                   "results": results}, f, indent=1)
    print(json.dumps({m: results[m]["median"] for m in results}))


if __name__ == "__main__":
    main()
