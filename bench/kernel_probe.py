"""Ablation probe for the LEGACY fused DIT kernel (v2): where did its
time go?

HISTORICAL (r2): this probe established that the v2 DIT kernel's bound
was its XLA-side prep chain (~47% of pipeline time), which motivated the
v3 raw-layout kernel and everything after.  It is kept runnable for the
v2 kernel only; the CURRENT kernel generation's ceiling question (v5
merged raw-DIT vs the attainable GEMM+DMA roofline at its exact shapes)
is answered by bench/roofline.py -> bench/roofline.json — use that, not
this, for any %-of-ceiling claim (VERDICT r3 #2/#8).

Each variant here is numerically WRONG by construction (it is a timing
probe, not a feature):

- base        unmodified fused_features_dit (adaptive tile)
- tile=N      explicit tile_t sweep (grid-step amortization)
- plainlog    _acc_log -> jnp.log (cost of the accurate-log polynomial)
- noroll      _concat_rolled without the sublane rolls (cost of the
              per-stream roll relayouts; GEMM shapes unchanged)
- prep        the XLA-side prep alone (preemph + parity deinterleave +
              hop2-block reshape + lane pad), materialized to HBM — an
              upper bound on what the prep contributes to the pipeline

Patched symbols are module-level lookups in ops/kernels/fused_dit, so a
FRESH jax.jit closure per variant guarantees retracing.  Results print as
JSON lines; nothing here feeds the driver bench.

Usage: python bench/kernel_probe.py [--iters 50] [--repeats 5]
"""

from __future__ import annotations

import argparse
import json
import statistics
import time

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", type=int, default=20,
                    help="kernel invocations per dispatch (lax.scan)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--variants", nargs="+",
                    default=["base", "tile1024", "plainlog", "noroll",
                             "prep"])
    args = ap.parse_args()

    import jax
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from mfcc_tpu import FeatureConfig
    from mfcc_tpu.ops import framing
    from mfcc_tpu.ops.kernels import fused_dit

    cfg = FeatureConfig().validate()
    sr = cfg.sample_rate
    n = int(args.seconds * sr)
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal((args.batch, n))).astype(np.float32)
    dev = jax.devices()[0]
    x_d = jax.device_put(jnp.asarray(audio), dev)
    interp = jax.default_backend() != "tpu"   # CPU smoke: interpret mode

    orig_log = fused_dit._acc_log
    orig_concat = fused_dit._concat_rolled

    def no_roll_concat(buf, tile, n_blocks, rows, hop2):
        piece = buf[:tile, :hop2]
        return (piece if n_blocks == 1
                else jnp.concatenate([piece] * n_blocks, axis=1))

    def prep_only(x):
        """Mirror of fused_features_dit's XLA-side prep (kept in sync by
        hand; timing bound only)."""
        y = framing.preemphasize(x, cfg)
        B, N = y.shape
        T0 = max(cfg.num_frames(N), 1)
        tile_t = min(512, fused_dit._round_up(T0, 128))
        hop2 = cfg.hop_len // 2
        T = cfg.num_frames(N)
        tiles = fused_dit._round_up(T, tile_t) // tile_t
        rows_needed = tiles * tile_t + fused_dit.Q_PAD
        n2 = rows_needed * hop2
        hop2_pad = fused_dit._round_up(hop2, fused_dit.LANE)

        def blocks(stream):
            s = stream.astype(jnp.float32)
            if s.shape[1] < n2:
                s = jnp.pad(s, ((0, 0), (0, n2 - s.shape[1])))
            b = s[:, :n2].reshape(B, rows_needed, hop2)
            if hop2_pad > hop2:
                b = jnp.pad(b, ((0, 0), (0, 0), (0, hop2_pad - hop2)))
            return b

        return blocks(y[:, 0::2]), blocks(y[:, 1::2])

    def make_fn(variant):
        fused_dit._acc_log = orig_log
        fused_dit._concat_rolled = orig_concat
        tile_t = None
        if variant.startswith("tile"):
            tile_t = int(variant[4:])
        elif variant == "plainlog":
            fused_dit._acc_log = jnp.log
        elif variant == "noroll":
            fused_dit._concat_rolled = no_roll_concat
        elif variant == "prep":
            return jax.jit(prep_only)
        elif variant != "base":
            raise SystemExit(f"unknown variant {variant!r}")

        def f(x):
            y = framing.preemphasize(x, cfg)
            return fused_dit.fused_features_dit(y, cfg, tile_t=tile_t,
                                                interpret=interp)

        return jax.jit(f)

    def scanned(fn):
        """args.scan invocations per dispatch, serialized by a scalar
        carry so XLA cannot hoist the loop body (bench.py protocol: the
        relay's ~2-3 ms dispatch round-trip otherwise floors everything)."""
        def body(carry, _):
            out = fn(x_d + carry)
            leaf = out[0] if isinstance(out, tuple) else out
            return (leaf.ravel()[0] * jnp.float32(1e-30)).astype(x_d.dtype), None

        def g():
            c, _ = jax.lax.scan(body, jnp.zeros((), x_d.dtype), None,
                                length=args.scan)
            return c
        return jax.jit(g)

    audio_sec = args.batch * args.seconds * args.scan * args.iters
    results = {}
    for variant in args.variants:
        fn = scanned(make_fn(variant))
        t0 = time.perf_counter()
        np.asarray(fn())          # compile + warm the d2h path
        compile_s = time.perf_counter() - t0
        reps = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = None
            for _ in range(args.iters):
                out = fn()
            np.asarray(out)       # force completion (relay-safe)
            reps.append(audio_sec / (time.perf_counter() - t0))
        results[variant] = {
            "audio_sec_per_s_median": round(statistics.median(reps), 1),
            "reps": [round(r, 1) for r in reps],
            "compile_or_cache_load_s": round(compile_s, 2),
        }
        print(json.dumps({"variant": variant, **results[variant]}),
              flush=True)
    # restore
    fused_dit._acc_log = orig_log
    fused_dit._concat_rolled = orig_concat


if __name__ == "__main__":
    main()
