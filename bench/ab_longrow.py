"""A/B: the long-row shape pathology and the blocked-row recovery (r5).

Three mode groups, one JSON artifact (bench/ab_longrow.json):

- ladder: the full auto pipeline at constant TOTAL samples while rows
  lengthen — (64, 10 s) ... (4, 160 s).  Shows the collapse the split
  packing and blocked routes exist to avoid (the kernel itself is
  shape-indifferent; the XLA-side pad+parity-deinterleave prep is the
  collapsing stage — probe split in docs/performance.md "Long-row
  shapes").
- blocked: mfcc_batch with the blocked route forced OFF vs ON at the
  runner's long-bucket shapes ((16, 30 s), (8, 60 s)).
- long: mfcc_long row_frames sweep at B=1 x 6 min vs the single long
  row and the XLA path.

Protocol: bench.py scan-carry-v2.  Writes bench/ab_longrow.json.
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--scan", type=int, default=20)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--groups", nargs="+",
                    default=["ladder", "blocked", "long"])
    args = ap.parse_args()

    import jax
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from mfcc_tpu import FeatureConfig
    from mfcc_tpu.models import mfcc as mfcc_model

    if args.small:
        args.scan, args.iters, args.repeats = 2, 2, 2
    cfg = FeatureConfig()
    sr = cfg.sample_rate
    rng = np.random.default_rng(0)

    def sig(n):
        return (0.3 * np.sin(2 * np.pi * 180 * np.arange(n) / sr)
                + 0.02 * rng.standard_normal(n)).astype(np.float32)

    def scan_timed(pipe, x0):
        def g():
            def body(c, _):
                out = pipe(x0 + c)
                return (out.ravel()[0] * jnp.float32(1e-30)).astype(
                    x0.dtype), None
            c, _ = jax.lax.scan(body, jnp.zeros((), x0.dtype), None,
                                length=args.scan)
            return c
        gj = jax.jit(g)
        for attempt in range(3):      # relay compiles occasionally drop
            try:
                np.asarray(gj())
                break
            except Exception:
                if attempt == 2:
                    raise
                time.sleep(5)
        reps = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = None
            for _ in range(args.iters):
                out = gj()
            np.asarray(out)
            reps.append((time.perf_counter() - t0)
                        / (args.iters * args.scan))
        return statistics.median(reps)

    results = {"device": str(jax.devices()[0]),
               "protocol": {"scan": args.scan, "iters": args.iters,
                            "repeats": args.repeats,
                            "note": "scan-carry-v2; LONG_ROUTE_FRAMES "
                                    "toggled to isolate the route"}}

    base_n = 32000 if args.small else 160000
    base_b = 4 if args.small else 64
    total = base_b * base_n

    if "ladder" in args.groups:
        rows = {}
        for k in ((1, 2) if args.small else (1, 2, 4, 8, 16)):
            B, N = base_b // k, base_n * k
            x = jnp.asarray(sig(total).reshape(B, N))
            l = jnp.full((B,), N, jnp.int32)
            mfcc_model.LONG_ROUTE_FRAMES = 10 ** 9   # plain (no route)
            dt = scan_timed(
                lambda xx, l=l: mfcc_model.mfcc_batch(xx, l, cfg)[0], x)
            rows[f"B{B}_N{N}"] = round(total / sr / dt, 1)
        mfcc_model.LONG_ROUTE_FRAMES = 4096
        results["ladder_plain_auto"] = {
            "rows": rows,
            "note": "same total samples; rate collapses as rows "
                    "lengthen — the wrapper prep pathology"}
        _dump(results)

    if "blocked" in args.groups:
        rows = {}
        for B, secs in ((2, 8),) if args.small else ((16, 30), (8, 60)):
            N = secs * sr
            x = jnp.asarray(sig(B * N).reshape(B, N))
            l = jnp.full((B,), N, jnp.int32)
            tot = B * secs
            mfcc_model.LONG_ROUTE_FRAMES = 10 ** 9
            dtp = scan_timed(
                lambda xx, l=l: mfcc_model.mfcc_batch(xx, l, cfg)[0], x)
            mfcc_model.LONG_ROUTE_FRAMES = 1024
            dtb = scan_timed(
                lambda xx, l=l: mfcc_model.mfcc_batch(xx, l, cfg)[0], x)
            rows[f"B{B}_{secs}s"] = {
                "plain": round(tot / dtp, 1),
                "blocked": round(tot / dtb, 1),
                "win": round(dtp / dtb, 2)}
        mfcc_model.LONG_ROUTE_FRAMES = 4096
        results["batched_blocked_route"] = rows
        _dump(results)

    if "long" in args.groups:
        secs = 20 if args.small else 360
        N = secs * sr
        x = jnp.asarray(sig(N))
        mfcc_model.LONG_ROUTE_FRAMES = 10 ** 9
        rows = {"single_row_auto": round(
            secs / scan_timed(lambda xx: mfcc_model.mfcc(xx, cfg), x), 1),
            "xla": round(secs / scan_timed(
                lambda xx: mfcc_model.mfcc(xx, cfg, "xla"), x), 1)}
        mfcc_model.LONG_ROUTE_FRAMES = 4096
        for rf in (127,) if args.small else (127, 255, 383, 511, 1023):
            rows[f"mfcc_long_rf{rf}"] = round(secs / scan_timed(
                lambda xx, rf=rf: mfcc_model.mfcc_long(
                    xx, cfg, row_frames=rf), x), 1)
        results["single_stream_b1"] = {
            "seconds": secs, "rows": rows,
            "note": "mfcc_long default rf=511; mfcc() auto-routes past "
                    "4096 frames"}

    _dump(results)
    print(json.dumps(results, indent=1))


def _dump(results):
    """Merge-write: a partial --groups run must not clobber the other
    groups' committed rows."""
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ab_longrow.json")
    merged = {}
    try:
        with open(out) as f:
            merged = json.load(f)
    except (OSError, ValueError):
        pass
    merged.update(results)
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)


if __name__ == "__main__":
    main()
