"""On-device A/B of the pitch Viterbi bound (VERDICT r2 item 9).

The pitch pipeline's documented bound (docs/performance.md) is the
T-step sequential ``lax.scan`` of the Viterbi smoother — per-step work
is a (B, n_lags, n_lags) broadcast-min (VPU microseconds); what costs is
T sequential steps of loop overhead.  Two levers, measured here:

- ``unroll`` (exact, bit-identical): pack N steps per compiled loop body.
- ``viterbi_blocked`` (opt-in, near-exact): cut the sequential chain to
  block + 2*warm by solving time chunks in parallel with zero-emission-
  padded warm-up context.  Deviation is confined to zero-evidence
  silence frames (measured in tests/test_pitch.py; path cost within
  0.03% of exact on the speech-like fixture).

Stages are timed separately (nccf / viterbi / full pitch_features) so
the split is committed, not guessed.  Protocol: bench.py scan-carry-v2.

Usage:  python bench/ab_viterbi.py [--scan 10] [--iters 5] [--repeats 5]
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
    ap.add_argument("--modes", nargs="+", default=[
        "nccf", "nccf-pallas", "viterbi-u1", "viterbi-pallas",
        "pitch-full", "pitch-full-pallas"])
    ap.add_argument("--long-seconds", type=float, default=360.0,
                    help="utterance length for the longform-* modes (B=1)")
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--warm", type=int, default=128)
    ap.add_argument("--nccf-chunk", type=int, default=128,
                    help="frames per chunk for the longform-*chunked* "
                         "modes (r5 chunked NCCF)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "ab_viterbi.json"))
    args = ap.parse_args()

    import jax
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from mfcc_tpu.config import PitchConfig
    from mfcc_tpu.ops import pitch as pitch_op
    from mfcc_tpu.ops.resample import resample

    pcfg = PitchConfig().validate()
    sr = pcfg.sample_rate
    n = int(args.seconds * sr)
    rng = np.random.default_rng(0)
    t = np.arange(n) / sr
    base = (0.4 * np.sin(2 * np.pi * 180 * t)
            + 0.15 * np.sin(2 * np.pi * 360 * t)).astype(np.float32)
    audio = np.tile(base, (args.batch, 1))
    audio += 0.02 * rng.standard_normal(audio.shape).astype(np.float32)
    lengths = np.full((args.batch,), n, np.int32)

    dev = jax.devices()[0]
    audio_d = jax.device_put(jnp.asarray(audio), dev)
    lengths_d = jax.device_put(jnp.asarray(lengths), dev)

    # precomputed NCCF input for the stage-isolated modes
    T = pcfg.num_frames(n)
    flens = jnp.minimum(pitch_op.pitch_frame_counts(lengths_d, pcfg), T)
    mask = jnp.arange(T, dtype=jnp.int32)[None, :] < flens[:, None]
    xw = resample(audio_d, pcfg.sample_rate, pcfg.work_rate)
    nccf_b, _ = jax.jit(lambda x: pitch_op.nccf(x, pcfg, mask))(xw)
    nccf_b = jnp.where(mask[..., None], nccf_b, 0.0)
    nccf_b = jax.device_put(jax.block_until_ready(nccf_b), dev)

    def pipeline(mode):
        if mode == "nccf":
            def fn(x):
                b, _ = pitch_op.nccf(x, pcfg, mask)
                return b
            return fn, xw
        if mode == "nccf-pallas":
            from mfcc_tpu.ops.kernels import fused_nccf

            def fn(x):
                mean_e = pitch_op.mean_frame_energy(x, pcfg, mask)
                ball = pcfg.ballast * mean_e * mean_e
                b, _ = fused_nccf.fused_nccf(x, ball, pcfg, T=int(T))
                return b
            return fn, xw
        if mode == "viterbi-pallas":
            from mfcc_tpu.ops.kernels import fused_viterbi
            return (lambda s: fused_viterbi.viterbi_pallas(s, pcfg)), nccf_b
        if mode == "pitch-full-pallas":
            def fn(x):
                f, _, _ = pitch_op.pitch_features(x, lengths_d, pcfg,
                                                  backend="pallas")
                return f
            return fn, audio_d
        if mode.startswith("viterbi-u"):
            u = int(mode[len("viterbi-u"):])
            return (lambda s: pitch_op.viterbi(s, pcfg, unroll=u)), nccf_b
        if mode == "viterbi-blocked":
            return (lambda s: pitch_op.viterbi_blocked(
                s, pcfg, block=args.block, warm=args.warm)), nccf_b
        if mode.startswith("longform-"):
            # B=1 single long stream: the regime where the exact scan has
            # no batch parallelism to amortize its T-step chain and the
            # blocked variant's C chunks supply the missing parallelism.
            nl = int(args.long_seconds * pcfg.work_rate)
            Tl = (nl - (pcfg.frame_len_w + pcfg.max_lag)) // pcfg.hop_len_w + 1
            rngl = np.random.default_rng(1)
            sl = jnp.asarray(
                0.5 * rngl.standard_normal((1, Tl, nccf_b.shape[-1]))
                .astype(np.float32))
            if mode == "longform-exact":
                return (lambda s: pitch_op.viterbi(s, pcfg)), sl
            if mode == "longform-blocked":
                return (lambda s: pitch_op.viterbi_blocked(
                    s, pcfg, block=args.block, warm=args.warm)), sl
            if mode == "longform-blocked-pallas":
                return (lambda s: pitch_op.viterbi_blocked(
                    s, pcfg, block=args.block, warm=args.warm,
                    backend="pallas")), sl
            # shared long-form audio for the e2e/stage modes
            nls = int(args.long_seconds * sr)
            rngf = np.random.default_rng(2)
            tl = np.arange(nls) / sr
            xl = (0.4 * np.sin(2 * np.pi * 180 * tl)
                  + 0.02 * rngf.standard_normal(nls)).astype(np.float32)
            xl_d = jax.device_put(jnp.asarray(xl)[None, :], dev)
            ll_d = jnp.asarray([nls], jnp.int32)
            if mode == "longform-full":
                # END-TO-END single stream: resample + NCCF kernel +
                # blocked Viterbi (chunks -> kernel lanes) + post

                def fn(x):
                    f, _, _ = pitch_op.pitch_features(
                        x, ll_d, pcfg, viterbi_block=args.block,
                        viterbi_warm=args.warm)
                    return f
                return fn, xl_d
            if mode.startswith("longform-full-chunked"):
                # r5 (VERDICT r4 #2): + chunked NCCF — K-frame chunks
                # fill the NCCF kernel's batch dimension at B=1
                K = int(mode.rsplit("-", 1)[-1]) if mode[-1].isdigit() \
                    else args.nccf_chunk

                def fn(x):
                    f, _, _ = pitch_op.pitch_features(
                        x, ll_d, pcfg, viterbi_block=args.block,
                        viterbi_warm=args.warm, nccf_chunk=K)
                    return f
                return fn, xl_d
            # ---- B=1 stage splits (the bound-naming rows) -------------
            nwl = int(args.long_seconds * pcfg.work_rate)
            Tl = ((nwl - (pcfg.frame_len_w + pcfg.max_lag))
                  // pcfg.hop_len_w + 1)
            mask_l = jnp.ones((1, Tl), bool)
            if mode == "longform-resample":
                return (lambda x: resample(x, pcfg.sample_rate,
                                           pcfg.work_rate)), xl_d
            xw_l = jax.block_until_ready(
                resample(xl_d, pcfg.sample_rate, pcfg.work_rate))
            if mode == "longform-nccf":
                def fn(x):
                    b, _ = pitch_op._nccf_dispatch(
                        x, pcfg, mask_l,
                        precision=jax.lax.Precision.HIGHEST,
                        backend="auto")
                    return b
                return fn, xw_l
            if mode.startswith("longform-nccf-chunked"):
                K = int(mode.rsplit("-", 1)[-1]) if mode[-1].isdigit() \
                    else args.nccf_chunk

                def fn(x):
                    b, _ = pitch_op._nccf_chunked(
                        x, pcfg, mask_l, K,
                        precision=jax.lax.Precision.HIGHEST,
                        backend="auto")
                    return b
                return fn, xw_l
            if mode == "longform-post":
                nb_l, np_l = jax.jit(lambda x: pitch_op._nccf_chunked(
                    x, pcfg, mask_l, args.nccf_chunk,
                    precision=jax.lax.Precision.HIGHEST,
                    backend="auto"))(xw_l)
                nb_l = jnp.where(mask_l[..., None], nb_l, 0.0)
                path_l = jax.block_until_ready(jax.jit(
                    lambda s: pitch_op.viterbi_blocked(
                        s, pcfg, block=args.block, warm=args.warm,
                        backend="pallas" if jax.default_backend() == "tpu"
                        else "xla"))(nb_l))
                from mfcc_tpu.ops import deltas as deltas_op
                from mfcc_tpu.ops import xmath
                flens_l = jnp.asarray([Tl], jnp.int32)

                def fn(nccf_p):
                    ym, c, yp = pitch_op._path_neighborhood(nccf_p, path_l)
                    dlag = pitch_op._parabolic_from(ym, c, yp, path_l,
                                                    nccf_p.shape[-1])
                    lag = pcfg.min_lag + path_l.astype(jnp.float32) + dlag
                    log_f0 = xmath.accurate_log(
                        jnp.float32(pcfg.work_rate) / lag)
                    pov = pitch_op.pov_feature(c)
                    wgt = (jnp.clip(c, 0.0, 1.0) ** 2
                           * mask_l.astype(c.dtype))
                    norm = log_f0 - pitch_op.weighted_sliding_mean(
                        log_f0, wgt, pcfg.norm_window)
                    d = deltas_op.deltas(log_f0[..., None],
                                         pcfg.delta_window,
                                         lengths=flens_l)[..., 0]
                    return jnp.stack([pov, norm, d], axis=-1)
                return fn, jax.block_until_ready(np_l)
            raise ValueError(mode)
        if mode == "resample":
            return (lambda x: resample(x, pcfg.sample_rate,
                                       pcfg.work_rate)), audio_d
        if mode == "post":
            # everything after the Viterbi: path values + parabolic +
            # POV + weighted sliding mean + delta, given (nccf_p, path)
            path0 = jax.jit(lambda s: pitch_op.viterbi(s, pcfg))(nccf_b)
            path0 = jax.block_until_ready(path0)
            from mfcc_tpu.ops import deltas as deltas_op
            from mfcc_tpu.ops import xmath

            def fn(nccf_p):
                ym, c, yp = pitch_op._path_neighborhood(nccf_p, path0)
                dlag = pitch_op._parabolic_from(ym, c, yp, path0,
                                                nccf_p.shape[-1])
                lag = pcfg.min_lag + path0.astype(jnp.float32) + dlag
                log_f0 = xmath.accurate_log(
                    jnp.float32(pcfg.work_rate) / lag)
                pov = pitch_op.pov_feature(c)
                wgt = jnp.clip(c, 0.0, 1.0) ** 2 * mask.astype(c.dtype)
                norm = log_f0 - pitch_op.weighted_sliding_mean(
                    log_f0, wgt, pcfg.norm_window)
                d = deltas_op.deltas(log_f0[..., None], pcfg.delta_window,
                                     lengths=flens)[..., 0]
                return jnp.stack([pov, norm, d], axis=-1)
            return fn, nccf_b
        if mode == "pitch-full":
            # forced XLA: "auto" resolves to the Pallas kernels on TPU
            # since r4, so the honest baseline row pins backend="xla"
            def fn(x):
                f, _, _ = pitch_op.pitch_features(x, lengths_d, pcfg,
                                                  backend="xla")
                return f
            return fn, audio_d
        if mode == "pitch-full-blocked":
            def fn(x):
                f, _, _ = pitch_op.pitch_features(
                    x, lengths_d, pcfg, viterbi_block=args.block,
                    viterbi_warm=args.warm)
                return f
            return fn, audio_d
        raise ValueError(mode)

    def scanned(fn, inp):
        def g():
            def body(carry, _):
                out = fn(inp + carry)
                return (out.ravel()[0] * inp.dtype.type(1e-30)).astype(
                    inp.dtype), None
            c, _ = jax.lax.scan(body, jnp.zeros((), inp.dtype), None,
                                length=args.scan)
            return c
        return jax.jit(g)

    def run_mode(mode):
        per_iter = (args.long_seconds if mode.startswith("longform-")
                    else args.batch * args.seconds)
        audio_sec = per_iter * args.scan * args.iters
        fn, inp = pipeline(mode)
        g = scanned(fn, inp)
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
        return {
            "audio_sec_per_s": [round(r, 1) for r in reps],
            "median": round(statistics.median(reps), 1),
            "compile_or_cache_load_s": round(compile_s, 2),
        }

    results = {}
    for mode in args.modes:
        results[mode] = run_mode(mode)
        print(json.dumps({"mode": mode, **results[mode]}), flush=True)

    with open(args.out, "w") as f:
        json.dump({"device": str(dev), "batch": args.batch,
                   "utt_seconds": args.seconds, "scan": args.scan,
                   "iters": args.iters, "repeats": args.repeats,
                   "block": args.block, "warm": args.warm,
                   "n_lags": pcfg.max_lag - pcfg.min_lag + 1,
                   "frames": int(T), "protocol": "scan-carry-v2",
                   "results": results}, f, indent=1)
    print(json.dumps({m: results[m]["median"] for m in results}))


if __name__ == "__main__":
    main()
