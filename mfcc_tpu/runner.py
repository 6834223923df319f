"""Corpus runner: WAV corpus -> feature files, resumably, at pod scale.

The orchestration layer over the pipelines — the analog of the reference
driver ``main.c`` (fixed pipeline, one input, exit(1) on any error) rebuilt
for production corpora: shape-bucketed batches, per-utterance error
quarantine (a corrupt WAV is skipped + logged, never kills the job —
SURVEY.md §5 failure detection), manifest-based resume, optional global
CMVN in two passes, and a structured JSON run report.

Data loading is host-local (each host processes its own shard of the
corpus listing); the only cross-host traffic is the CMVN statistics
reduction.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from .config import FeatureConfig
from .models import mfcc as mfcc_model, logmel as logmel_model
from .parallel import cmvn as cmvn_lib, dist
from .utils import batch as batch_lib, manifest as manifest_lib, report, wav


@dataclass
class RunnerOptions:
    out_dir: str = "features"
    batch_size: int = 16
    logmel: bool = False              # log-mel pipeline instead of MFCC
    min_bucket: int = 16_000          # 1 s
    max_bucket: int = 16_000 * 30     # 30 s
    resume: bool = True
    trace_dir: str | None = None
    backend: str = "auto"
    ladder: list = field(default_factory=list)


def collect_wavs(path: str) -> list[str]:
    """A .wav file, a directory (recursive), or a .txt listing."""
    if os.path.isdir(path):
        out = []
        for root, _dirs, files in os.walk(path):
            out += [os.path.join(root, f) for f in files
                    if f.lower().endswith(".wav")]
        return sorted(out)
    if path.lower().endswith(".txt"):
        with open(path) as f:
            return [ln.strip() for ln in f if ln.strip()]
    return [path]


def _load_utterances(paths, cfg, rep):
    """Yield (path, float32 signal) with quarantine on decode failure."""
    for p in paths:
        try:
            x, sr = wav.read_wav(p)
        except (OSError, ValueError) as e:
            print(f"[quarantine] {p}: {e}")
            continue
        if sr != cfg.sample_rate:
            print(f"[quarantine] {p}: sample rate {sr} != {cfg.sample_rate}")
            continue
        rep.n_utterances += 1
        rep.audio_seconds += len(x) / cfg.sample_rate
        yield p, x


def _feature_fn(opts):
    return (logmel_model.log_mel_batch_jit if opts.logmel
            else mfcc_model.mfcc_batch_jit)


def _out_path(out_dir: str, wav_path: str) -> str:
    base = os.path.splitext(os.path.basename(wav_path))[0]
    return os.path.join(out_dir, base + ".npy")


def run(corpus: str, cfg: FeatureConfig, opts: RunnerOptions) -> report.RunReport:
    """Extract features for a corpus.  Returns the run report."""
    cfg.validate()
    os.makedirs(opts.out_dir, exist_ok=True)
    rep = report.RunReport(
        config_hash=cfg.config_hash(),
        n_devices=jax.device_count(),
        n_hosts=jax.process_count(),
    )
    paths = dist.host_shard(collect_wavs(corpus))
    man = manifest_lib.Manifest(
        os.path.join(opts.out_dir, f"manifest.{jax.process_index()}.json"),
        cfg.config_hash()) if opts.resume else None
    if man is not None:
        paths = man.pending(paths)

    ladder = opts.ladder or batch_lib.bucket_ladder(
        opts.min_bucket, opts.max_bucket)
    fn = _feature_fn(opts)

    stats_path = os.path.join(opts.out_dir, "cmvn.npz")
    stats = cmvn_lib.Stats.zero(cfg.n_feats if not opts.logmel
                                else cfg.n_mels * (3 if cfg.deltas else 1))

    t0 = time.perf_counter()
    with report.maybe_profile(opts.trace_dir):
        for pb in batch_lib.make_batches(
                _load_utterances(paths, cfg, rep), opts.batch_size, ladder):
            with report.stage_timer(rep, "compute"):
                feat, flens, mask = fn(
                    jnp.asarray(pb.audio), jnp.asarray(pb.lengths), cfg,
                    opts.backend)
                if cfg.cmvn:
                    stats = stats.merge(cmvn_lib.batch_stats(feat, mask))
                feat_np = np.asarray(feat)
                flens_np = np.asarray(flens)
            with report.stage_timer(rep, "write"):
                for i, uid in enumerate(pb.ids):
                    np.save(_out_path(opts.out_dir, uid),
                            feat_np[i, : flens_np[i]])
                    if man is not None:
                        man.mark(uid)
                if man is not None:
                    man.save()
    rep.wall_seconds = time.perf_counter() - t0

    if cfg.cmvn:
        # global reduction across hosts happens automatically when stats
        # were computed from sharded arrays; persist for the apply pass
        manifest_lib.save_cmvn(stats_path, stats, cfg.config_hash())
        _apply_cmvn_pass(paths, stats, opts)

    rep.dump(os.path.join(opts.out_dir,
                          f"run_report.{jax.process_index()}.json"))
    return rep


def _apply_cmvn_pass(paths, stats, opts):
    """Second pass: normalize the written features in place."""
    mean, var = (np.asarray(v) for v in stats.mean_var())
    inv_std = 1.0 / np.sqrt(var)
    for p in paths:
        fp = _out_path(opts.out_dir, p)
        if os.path.exists(fp):
            feat = np.load(fp)
            np.save(fp, (feat - mean) * inv_std)
