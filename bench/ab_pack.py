"""A/B: padded ragged batches vs packed ragged batches (VERDICT r4 #1).

The ragged benchmark's padded program runs at utilization == mean fill
(75% on the benchmark's uniform n/2..n distribution): 348.0k real
audio-sec/s vs 423.9k padded (r4 results.json).  Packing multiple
utterances per row at hop-aligned offsets (utils/batch.pack_rows +
models/mfcc.mfcc_batch_packed, bit-identical per segment) carries real
audio in the padded slack.

Protocol: scan-carry (bench.py protocol) on three same-session programs:
  padded-full    (64, n) all rows full            -> the padded ceiling
  padded-ragged  (64, n) lengths n/2..n           -> the r4 baseline
  packed-ragged  (8, 8n) steady-state FFD rows    -> this A/B's subject
Real-audio-sec counted per program; rates are medians of --repeats.

Writes bench/ab_pack.json.
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
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--scan", type=int, default=20)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from mfcc_tpu import FeatureConfig
    from mfcc_tpu.models import mfcc as mfcc_model
    from mfcc_tpu.utils import batch as batch_lib

    B, sec = (4, 2.0) if args.small else (64, 10.0)
    if args.small:
        args.scan, args.iters, args.repeats = 2, 2, 2
    sr = 16000
    n = int(sec * sr)
    cfg = FeatureConfig()
    rng = np.random.default_rng(0)
    t = np.arange(n) / sr
    base = (0.3 * np.sin(2 * np.pi * 180 * t)
            + 0.1 * np.sin(2 * np.pi * 1200 * t)).astype(np.float32)

    # the benchmark's ragged length distribution (bench/full.py config2)
    lengths = np.linspace(n // 2, n, B).astype(np.int32)

    def make_sig(L, i):
        s = np.empty(L, np.float32)
        reps = -(-L // n)
        s[:] = np.tile(base, reps)[:L]
        s += 0.02 * rng.standard_normal(L).astype(np.float32)
        return s

    # ---- padded programs: full and ragged -----------------------------
    audio = np.zeros((B, n), np.float32)
    for i, L in enumerate(lengths):
        audio[i, :L] = make_sig(int(L), i)
    full_lengths = np.full((B,), n, np.int32)

    dev = jax.devices()[0]
    ad = jax.device_put(jnp.asarray(audio), dev)
    ld = jax.device_put(jnp.asarray(lengths), dev)
    lfd = jax.device_put(jnp.asarray(full_lengths), dev)

    # ---- packed program: steady-state FFD rows of capacity pack_k*n ---
    pack_k = 8
    C = pack_k * n
    Bp = max(B // pack_k, 1)
    # stream enough utterances that Bp rows are steady-state full (the
    # FFD window must hold comfortably more than capacity/mean_len items)
    stream = [(i, int(lengths[i % B])) for i in range(8 * B)]
    rows = list(batch_lib.pack_rows(stream, capacity=C, hop=cfg.hop_len,
                                    lookahead=4 * B))[:Bp]
    S = max(len(r.segments) for r in rows)
    xp = np.zeros((Bp, C), np.float32)
    starts = np.zeros((Bp, S), np.int32)
    lens = np.zeros((Bp, S), np.int32)
    for b, row in enumerate(rows):
        sig, st, ln = batch_lib.pack_audio(
            row, lambda uid: make_sig(int(lengths[uid % B]), uid))
        xp[b] = sig
        starts[b, : len(st)], lens[b, : len(ln)] = st, ln
    packed_audio_sec = float(lens.sum()) / sr
    fill = float(lens.sum()) / (Bp * C)
    xpd = jax.device_put(jnp.asarray(xp), dev)
    std = jax.device_put(jnp.asarray(starts), dev)
    lnd = jax.device_put(jnp.asarray(lens), dev)

    def scan_timed(pipe, x0):
        def g():
            def body(carry, _):
                out = pipe(x0 + carry)
                return (out.ravel()[0] * jnp.float32(1e-30)).astype(
                    x0.dtype), None
            c, _ = jax.lax.scan(body, jnp.zeros((), x0.dtype), None,
                                length=args.scan)
            return c
        gj = jax.jit(g)
        np.asarray(gj())
        reps = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = None
            for _ in range(args.iters):
                out = gj()
            np.asarray(out)
            reps.append((time.perf_counter() - t0)
                        / (args.iters * args.scan))
        return statistics.median(reps), reps

    results = {"device": str(dev), "batch": B, "utt_seconds": sec,
               "pack_capacity_rows": Bp, "pack_capacity_seconds": C / sr,
               "pack_max_segments": S, "pack_fill": round(fill, 4),
               "protocol": {"scan": args.scan, "iters": args.iters,
                            "repeats": args.repeats}}

    dt, reps = scan_timed(
        lambda x: mfcc_model.mfcc_batch(x, lfd, cfg)[0], ad)
    results["padded_full"] = {
        "audio_sec_per_s": round(B * sec / dt, 1),
        "reps": [round(B * sec / r, 1) for r in reps]}

    ragged_sec = float(lengths.sum()) / sr
    dt, reps = scan_timed(
        lambda x: mfcc_model.mfcc_batch(x, ld, cfg)[0], ad)
    results["padded_ragged"] = {
        "real_audio_sec_per_s": round(ragged_sec / dt, 1),
        "mean_fill": round(float(lengths.sum()) / (B * n), 4),
        "reps": [round(ragged_sec / r, 1) for r in reps]}

    dt, reps = scan_timed(
        lambda x: mfcc_model.mfcc_batch_packed(x, std, lnd, cfg)[0], xpd)
    results["packed_ragged"] = {
        "real_audio_sec_per_s": round(packed_audio_sec / dt, 1),
        "fill": round(fill, 4),
        "reps": [round(packed_audio_sec / r, 1) for r in reps]}

    # ---- split packing at the PROVEN (B, n) shape: utterances split
    # across rows at frame boundaries (streaming-chunk construction), so
    # rows fill to ~100% without changing the kernel's best shape -------
    stream2 = [(i, int(lengths[i % B])) for i in range(4 * B)]
    rows_s = list(batch_lib.pack_rows_split(
        stream2, capacity=n, hop=cfg.hop_len,
        frame_len=cfg.frame_len))[:B]
    Ss = max(len(r.segments) for r in rows_s)
    xs = np.zeros((B, n), np.float32)
    starts_s = np.zeros((B, Ss), np.int32)
    lens_s = np.zeros((B, Ss), np.int32)
    real = 0
    for b, row in enumerate(rows_s):
        sig, st, ln, pcs = batch_lib.pack_audio_split(
            row, lambda uid: make_sig(int(lengths[uid % B]), uid))
        xs[b] = sig
        starts_s[b, : len(st)], lens_s[b, : len(ln)] = st, ln
        # real audio credited: frames emitted x hop (+ tail window once
        # per utterance-final piece) — conservative: count span MINUS
        # the duplicated overlap of continuations
        for pc in pcs:
            real += pc.n_frames * cfg.hop_len
    split_audio_sec = real / sr
    split_fill = real / (B * n)
    xsd = jax.device_put(jnp.asarray(xs), dev)
    stsd = jax.device_put(jnp.asarray(starts_s), dev)
    lnsd = jax.device_put(jnp.asarray(lens_s), dev)
    dt, reps = scan_timed(
        lambda x: mfcc_model.mfcc_batch_packed(x, stsd, lnsd, cfg)[0],
        xsd)
    results["packed_split_ragged"] = {
        "real_audio_sec_per_s": round(split_audio_sec / dt, 1),
        "fill_frames_x_hop": round(split_fill, 4),
        "max_segments": int(Ss),
        "reps": [round(split_audio_sec / r, 1) for r in reps]}

    # ---- r5b: the other frame-local families through the same split-
    # packed rows (PLP's LPC tail and the spec projection are per-frame,
    # so packing composes; ragged padded baselines in results.json) ----
    for fam in ("plp", "spec"):
        dt, reps = scan_timed(
            lambda x, fam=fam: mfcc_model.mfcc_batch_packed(
                x, stsd, lnsd, cfg, family=fam)[0], xsd)
        results[f"packed_split_{fam}"] = {
            "real_audio_sec_per_s": round(split_audio_sec / dt, 1),
            "reps": [round(split_audio_sec / r, 1) for r in reps]}

    best = max(results["packed_ragged"]["real_audio_sec_per_s"],
               results["packed_split_ragged"]["real_audio_sec_per_s"])
    results["packed_vs_padded_ragged"] = round(
        best / results["padded_ragged"]["real_audio_sec_per_s"], 3)
    results["packed_pct_of_padded_full"] = round(
        100.0 * best / results["padded_full"]["audio_sec_per_s"], 1)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ab_pack.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
