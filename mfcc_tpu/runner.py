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

from . import oracle
from .config import FeatureConfig
from .models import mfcc as mfcc_model, logmel as logmel_model
from .parallel import cmvn as cmvn_lib, dist, mesh as mesh_lib
from .utils import (batch as batch_lib, kaldi as kaldi_lib,
                    manifest as manifest_lib, report, wav)


class NpyWriter:
    """One .npy per utterance (default)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def write(self, uid: str, feat: np.ndarray):
        np.save(_out_path(self.out_dir, uid), feat)

    def finish(self):
        pass

    def apply_cmvn(self, uids, mean, inv_std):
        for uid in uids:
            fp = _out_path(self.out_dir, uid)
            if os.path.exists(fp):
                np.save(fp, (np.load(fp) - mean) * inv_std)


class TFRecordWriter:
    """TFRecord of tf.train.Examples: features.<host>.tfrecord."""

    def __init__(self, out_dir: str, host: int):
        self.path = os.path.join(out_dir, f"features.{host}.tfrecord")
        self.feats: dict[str, np.ndarray] = {}

    def write(self, uid: str, feat: np.ndarray):
        from .utils import tfrecord  # noqa: F401 (import check at use)
        self.feats[os.path.splitext(os.path.basename(uid))[0]] = feat

    def finish(self):
        from .utils import tfrecord
        tfrecord.write_tfrecord(self.path, self.feats)

    def apply_cmvn(self, uids, mean, inv_std):
        from .utils import tfrecord
        feats = tfrecord.read_tfrecord(self.path)
        tfrecord.write_tfrecord(
            self.path, {u: (f - mean) * inv_std for u, f in feats.items()})


class ArkWriter:
    """Kaldi binary archive: features.<host>.{ark,scp} (utils/kaldi.py)."""

    def __init__(self, out_dir: str, host: int):
        self.prefix = os.path.join(out_dir, f"features.{host}")
        self.feats: dict[str, np.ndarray] = {}

    def write(self, uid: str, feat: np.ndarray):
        self.feats[os.path.splitext(os.path.basename(uid))[0]] = feat

    def finish(self):
        kaldi_lib.write_ark_scp(self.prefix, self.feats)

    def apply_cmvn(self, uids, mean, inv_std):
        feats = kaldi_lib.read_scp(self.prefix + ".scp")
        feats = {u: (f - mean) * inv_std for u, f in feats.items()}
        kaldi_lib.write_ark_scp(self.prefix, feats)


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
    out_format: str = "npy"           # "npy" | "ark" (Kaldi archive)
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


def _probe(paths, cfg):
    """Header-only probe: yield (path, n_samples); quarantine bad files."""
    for p in paths:
        try:
            n, sr = wav.wav_info(p)
        except (OSError, ValueError) as e:
            print(f"[quarantine] {p}: {e}")
            continue
        if sr != cfg.sample_rate:
            print(f"[quarantine] {p}: sample rate {sr} != {cfg.sample_rate}")
            continue
        yield p, n


def _decode_batch(pb, cfg):
    """Decode a PathBatch to (audio (B, bucket) i16-or-f32, lengths i32).

    Fast path: PCM16 passthrough (raw int16, half the host->device bytes;
    the pipeline casts on-device).  If any file is not mono PCM16 the
    whole batch falls back to the float decoder so dtypes stay uniform.
    Rows that fail late (corrupt despite a sane header) are quarantined
    by zeroing their length.  Pure-Python fallback mirrors the semantics
    when the native library is unavailable.
    """
    B = len(pb.paths)
    real = [p for p in pb.paths if p is not None]   # Nones pad the tail
    try:
        from .native import read_wavs_padded, read_wavs_padded_i16
        a, lens, rates, errors = read_wavs_padded_i16(real, pb.bucket)
        if np.any(errors == -6):  # non-PCM16 content: float path
            a, lens, rates, errors = read_wavs_padded(real, pb.bucket)
        for i, p in enumerate(real):
            if errors[i] != 0:
                print(f"[quarantine] {p}: native decode error {errors[i]}")
                lens[i] = 0
            elif rates[i] != cfg.sample_rate:
                print(f"[quarantine] {p}: sample rate {rates[i]}")
                lens[i] = 0
                a[i] = 0
    except ImportError:
        a = np.zeros((len(real), pb.bucket), np.float32)
        lens = np.zeros((len(real),), np.int64)
        for i, p in enumerate(real):
            try:
                x, sr = wav.read_wav(p)
                if sr != cfg.sample_rate:
                    raise wav.WavError(f"sample rate {sr}")
                L = min(len(x), pb.bucket)
                a[i, :L] = x[:L]
                lens[i] = L
            except (OSError, ValueError) as e:
                print(f"[quarantine] {p}: {e}")
    audio = np.zeros((B, pb.bucket), a.dtype)
    lengths = np.zeros((B,), np.int32)
    audio[: len(real)] = a
    lengths[: len(real)] = lens.astype(np.int32)
    return audio, lengths


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

    # data parallelism over local devices: shard the batch axis so one
    # dispatch spans all chips (requires batch_size % n_devices == 0)
    n_dev = jax.local_device_count()
    mesh = None
    if n_dev > 1 and opts.batch_size % n_dev == 0:
        mesh = mesh_lib.make_mesh()

    def _to_device(audio, lengths):
        a, l = jnp.asarray(audio), jnp.asarray(lengths)
        if mesh is not None:
            a = jax.device_put(a, mesh_lib.data_sharding(mesh, a.ndim))
            l = jax.device_put(l, mesh_lib.data_sharding(mesh, 1))
        return a, l
    writer = {"npy": lambda: NpyWriter(opts.out_dir),
              "ark": lambda: ArkWriter(opts.out_dir, jax.process_index()),
              "tfrecord": lambda: TFRecordWriter(
                  opts.out_dir, jax.process_index())}[opts.out_format]()

    stats_path = os.path.join(opts.out_dir, "cmvn.npz")
    stats = cmvn_lib.Stats.zero(cfg.n_feats if not opts.logmel
                                else cfg.n_mels * (3 if cfg.deltas else 1))

    def _self_check(pb, lengths, feat_np, flens_np):
        """Differential spot-check: first real utterance of the run vs the
        float64 oracle — every run report carries its own accuracy proof
        (rep.max_abs_error)."""
        for i, p in enumerate(pb.paths):
            if p is None or lengths[i] == 0 or flens_np[i] == 0:
                continue
            try:
                x, _sr = wav.read_wav(p)
            except (OSError, ValueError):
                continue
            ref_fn = oracle.log_mel if opts.logmel else oracle.mfcc
            want = ref_fn(x[: lengths[i]].astype(np.float64), cfg)
            got = feat_np[i, : flens_np[i]]
            if cfg.cmvn:
                return  # features are pre-normalization here; skip
            rep.max_abs_error = float(
                np.abs(got[: want.shape[0]] - want).max())
            return

    def _write_out(pb, lengths, feat, flens):
        """Fetch a finished batch (blocks on ITS device work only)."""
        with report.stage_timer(rep, "fetch+write"):
            from .utils.fetch import chunked_to_numpy
            feat_np = chunked_to_numpy(feat)
            flens_np = np.asarray(flens)
            if rep.max_abs_error is None:
                _self_check(pb, lengths, feat_np, flens_np)
            for i, uid in enumerate(pb.paths):
                if uid is None or lengths[i] == 0:
                    continue  # padding row / quarantined at decode time
                writer.write(uid, feat_np[i, : flens_np[i]])
                if man is not None:
                    man.mark(uid)
            if man is not None:
                man.save()

    t0 = time.perf_counter()
    in_flight = None  # depth-2 software pipeline: decode/dispatch N+1
    with report.maybe_profile(opts.trace_dir):  # while N's results drain
        for pb in batch_lib.make_path_batches(
                _probe(paths, cfg), opts.batch_size, ladder):
            with report.stage_timer(rep, "decode"):
                audio, lengths = _decode_batch(pb, cfg)
                rep.n_utterances += int((lengths > 0).sum())
                rep.audio_seconds += float(lengths.sum()) / cfg.sample_rate
            with report.stage_timer(rep, "dispatch"):
                # jax dispatch is async: transfer + compute overlap the
                # previous batch's fetch/write below
                a_dev, l_dev = _to_device(audio, lengths)
                feat, flens, mask = fn(a_dev, l_dev, cfg, opts.backend)
                if cfg.cmvn:
                    stats = stats.merge(cmvn_lib.batch_stats(feat, mask))
            if in_flight is not None:
                _write_out(*in_flight)
            in_flight = (pb, lengths, feat, flens)
        if in_flight is not None:
            _write_out(*in_flight)
    writer.finish()
    rep.wall_seconds = time.perf_counter() - t0

    if cfg.cmvn:
        # global reduction across hosts happens automatically when stats
        # were computed from sharded arrays; persist for the apply pass
        manifest_lib.save_cmvn(stats_path, stats, cfg.config_hash())
        mean, var = (np.asarray(v) for v in stats.mean_var())
        writer.apply_cmvn(paths, mean, 1.0 / np.sqrt(var))

    rep.dump(os.path.join(opts.out_dir,
                          f"run_report.{jax.process_index()}.json"))
    return rep


