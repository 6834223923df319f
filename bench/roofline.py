"""Measured attainable roofline for the v5 merged raw-DIT kernel
(VERDICT r3 #2: settle the "kernel lever space exhausted" claim with a
measurement, not a MAC model).

docs/performance.md r3 said v5 runs at ~47% of a THEORETICAL bf16x6
ceiling and attributed the residual to "pass structure and DMA overlap"
without measuring either.  This probe times, on device, Pallas kernels
with v5's EXACT grid, DMA pattern, and GEMM shapes but with parts of the
work removed, so the ceiling is what this chip actually attains at these
shapes rather than what a MAC count promises:

- ``dma-only``     same grid + double-buffered HBM DMA of the raw rows,
                   output tile written, zero compute.  The pure memory
                   path: an upper bound for any kernel with this IO.
- ``gemm-chain``   DMA + the four HIGHEST-precision GEMMs at v5's exact
                   merged-path shapes ((1024,200)x(200,256) x2 parities,
                   (1024,256)x(256,128) mel, (1024,128)x(128,128) DCT)
                   connected by one elementwise square-add.  No frame
                   assembly, no twiddle combine, no log: the attainable
                   MXU+DMA ceiling for v5's dataflow.
- ``gemm-log``     gemm-chain + the accurate-log polynomial on the mel
                   output — isolates the transcendental's share.
- ``v5``           the real fused_features_raw_dit merged kernel, timed
                   under the identical protocol (cross-check vs
                   bench/ab_backend.json).

All variants consume the DMA'd buffer (a scalar broadcast into the GEMM
LHS) so Mosaic cannot dead-code the copies, and the two parity GEMMs use
the kernel's two distinct bases so they cannot CSE.  Timing: bench.py
scan-carry-v2 (K invocations per dispatch serialized by a scalar carry).

Probe kernels are intentionally numerically meaningless — this file
measures time, not features.  Writes bench/roofline.json.

Usage: python bench/roofline.py [--scan 10] [--iters 5] [--repeats 5]
"""

from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--variants", nargs="+",
                    default=["dma-only", "gemm-chain", "gemm-log", "v5"])
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "roofline.json"))
    args = ap.parse_args()

    import jax
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mfcc_tpu import FeatureConfig
    from mfcc_tpu.ops.kernels import fused_raw_dit as v5mod
    from mfcc_tpu.ops.kernels.fused_mfcc import _acc_log

    cfg = FeatureConfig().validate()
    interp = jax.default_backend() != "tpu"
    sr = cfg.sample_rate
    n = int(args.seconds * sr)
    B = args.batch
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal((B, n))).astype(np.float32)
    dev = jax.devices()[0]
    x_d = jax.device_put(jnp.asarray(audio), dev)

    # --- v5's exact plan for this workload -------------------------------
    T = cfg.num_frames(n)
    hop_h = cfg.hop_len // 2
    tile_t = min(1024, v5mod._round_up(T, 8 * 8))
    plan = v5mod._plan(cfg, tile_t, True, merged=True)
    assert plan.merged, "probe requires the merged path to be eligible"
    LANE, LEAD = v5mod.LANE, v5mod.LEAD
    tiles = v5mod._round_up(T, plan.tile_t) // plan.tile_t
    rows_per_tile = plan.tile_t * hop_h // LANE
    rows_total = (tiles - 1) * rows_per_tile + LEAD + plan.rows_span
    span = LEAD + plan.rows_span
    M = plan.P * plan.fpp              # merged GEMM rows (1024)
    K = plan.Le                        # frame samples per parity (200)
    H = plan.H                         # 256
    MP, OP = plan.mels_pad, plan.out_pad

    bas_e, bas_o, _tw, mcat, _mny, dctm = v5mod._matrices(
        cfg, MP, OP, True)

    def raw_of(x):
        tail = 2 * rows_total * LANE - 2 * LEAD * LANE - n
        xp = jnp.pad(x, ((0, 0), (2 * LEAD * LANE, tail)))
        return (xp.reshape(B, rows_total * LANE, 2)
                  .transpose(0, 2, 1).reshape(B, 2, rows_total, LANE))

    prec = jax.lax.Precision.HIGHEST

    def probe_kernel(raw_hbm, be, bo, mc, dc, out_ref, buf, sem, *,
                     mode):
        b = pl.program_id(0)
        t = pl.program_id(1)
        n_tiles = pl.num_programs(1)
        step = b * n_tiles + t
        slot = jax.lax.rem(step, 2)

        def dma(bi, ti, sl):
            return pltpu.make_async_copy(
                raw_hbm.at[bi, :, pl.ds(ti * rows_per_tile, span), :],
                buf.at[sl], sem.at[sl])

        @pl.when(step == 0)
        def _():
            dma(b, t, slot).start()
        nstep = step + 1
        nb_, nt_ = nstep // n_tiles, jax.lax.rem(nstep, n_tiles)

        @pl.when(nstep < pl.num_programs(0) * n_tiles)
        def _():
            dma(nb_, nt_, 1 - slot).start()
        dma(b, t, slot).wait()
        x0 = buf[slot, 0]
        if mode == "dma":
            out_ref[0, :, :] = jnp.full((plan.tile_t, OP), x0[0, 0],
                                        jnp.float32)
            return
        # build the (M, H) GEMM LHS in VMEM from the DMA'd buffer (as v5
        # does via its roll+select assembly — a constant HBM operand here
        # would add a per-step refetch v5 doesn't pay): 8 buffer rows,
        # lane-doubled by an aligned concat, sublane-repeated to M rows
        xr = jnp.concatenate([x0[0:8, :], x0[8:16, :]], axis=1)  # (8, 256)
        L = pltpu.repeat(xr, repeats=M // 8, axis=0)             # (M, 256)
        Se = jnp.dot(L[:, :K], be[:], preferred_element_type=jnp.float32,
                     precision=prec)
        So = jnp.dot(L[:, :K], bo[:], preferred_element_type=jnp.float32,
                     precision=prec)
        pcat = Se * Se + So * So
        e = jnp.dot(pcat, mc[:], preferred_element_type=jnp.float32,
                    precision=prec)
        if mode == "gemmlog":
            e = _acc_log(jnp.maximum(e, 1e-10))
        f = jnp.dot(e, dc[:], preferred_element_type=jnp.float32,
                    precision=prec)
        out_ref[0, :, :] = f

    def make_probe(mode):
        bej = jnp.asarray(bas_e[:K])     # (200, 256)
        boj = jnp.asarray(bas_o[:plan.Lo])
        if plan.Lo != K:                  # pad odd parity to same K
            boj = jnp.pad(boj, ((0, K - plan.Lo), (0, 0)))
        mcj, dcj = jnp.asarray(mcat), jnp.asarray(dctm)
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            functools.partial(probe_kernel, mode=mode),
            grid=(B, tiles),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [vmem] * 4,
            out_specs=pl.BlockSpec((1, plan.tile_t, OP),
                                   lambda b, t: (b, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (B, tiles * plan.tile_t, OP), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, 2, span, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interp,
        )

        def fn(x):
            return call(raw_of(x), bej, boj, mcj, dcj)
        return fn

    def make_fn(variant):
        if variant == "dma-only":
            return make_probe("dma")
        if variant == "gemm-chain":
            return make_probe("gemm")
        if variant == "gemm-log":
            return make_probe("gemmlog")
        if variant == "v5":
            return lambda x: v5mod.fused_features_raw_dit(
                x, cfg, merged=True, interpret=interp)
        raise SystemExit(f"unknown variant {variant!r}")

    def scanned(fn):
        def g():
            def body(carry, _):
                out = fn(x_d + carry)
                return (out.ravel()[0] * jnp.float32(1e-30)).astype(
                    x_d.dtype), None
            c, _ = jax.lax.scan(body, jnp.zeros((), x_d.dtype), None,
                                length=args.scan)
            return c
        return jax.jit(g)

    audio_sec = B * args.seconds * args.scan * args.iters
    results = {}
    for variant in args.variants:
        g = scanned(make_fn(variant))
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
        results[variant] = {
            "audio_sec_per_s": [round(r, 1) for r in reps],
            "median": round(statistics.median(reps), 1),
            "compile_or_cache_load_s": round(compile_s, 2),
        }
        print(json.dumps({"variant": variant, **results[variant]}),
              flush=True)

    derived = {}
    if "v5" in results and "gemm-chain" in results:
        derived["v5_pct_of_attainable_gemm_dma_ceiling"] = round(
            100.0 * results["v5"]["median"]
            / results["gemm-chain"]["median"], 1)
    if "gemm-log" in results and "gemm-chain" in results:
        derived["log_cost_pct_of_gemm_chain"] = round(
            100.0 * (results["gemm-chain"]["median"]
                     / results["gemm-log"]["median"] - 1.0), 1)
    if "dma-only" in results and "gemm-chain" in results:
        derived["gemm_cost_pct_of_dma_floor"] = round(
            100.0 * (results["dma-only"]["median"]
                     / results["gemm-chain"]["median"] - 1.0), 1)
    shapes = {
        "merged_gemm_rows_M": M, "frame_K_per_parity": K,
        "dft_lanes_N": H, "mel": [H, MP], "dct": [MP, OP],
        "tile_t": plan.tile_t, "grid": [B, tiles],
        "dma_span_rows": span, "precision": "HIGHEST (bf16x6)",
    }
    with open(args.out, "w") as f:
        json.dump({"device": str(dev), "batch": B,
                   "utt_seconds": args.seconds, "scan": args.scan,
                   "iters": args.iters, "repeats": args.repeats,
                   "protocol": "scan-carry-v2", "shapes": shapes,
                   "results": results, "derived": derived}, f, indent=1)
    print(json.dumps(derived))


if __name__ == "__main__":
    main()
