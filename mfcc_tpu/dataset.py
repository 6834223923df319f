"""Direct-to-training feature batches: corpus in, device arrays out.

The corpus runner (runner.py) materializes features to disk — the right
shape for offline extraction.  Training jobs want the OTHER shape: an
iterator of ready-to-consume `(features, frame_counts, mask)` device
batches with no filesystem round-trip, the role torchaudio datasets /
Kaldi egs play in their stacks.  This module composes the same proven
pieces — header-probe bucketing, native threaded decode, foreign-rate
resample policy, quarantine — into that iterator:

    for b in dataset.feature_batches(corpus, cfg, batch_size=32,
                                     augment_seed=0):
        loss = train_step(b.features, b.mask)

Design notes (all inherited invariants):
- Static shapes: batches come out at (batch_size, T_bucket, n_feats) per
  ladder bucket; remainders are padded rows with mask 0 — one compiled
  program per bucket, ever.
- Software pipelining: batch N+1 is decoded and dispatched while batch N
  is being consumed (same depth-2 scheme as the runner).
- Optional on-device SpecAugment (ops/augment.py) keyed by
  (augment_seed, epoch, batch_index): reproducible, and fresh masks every
  epoch without host RNG state.
- Optional CMVN from precomputed statistics (cmvn.npz written by a
  runner pass) applied on device; padding rows stay exactly zero.

Reference analog: the reference has exactly one consumer shape (a file
path argv, /root/reference/src/mfcc/main.c:57-60); a framework serves
both the offline-archive and the training-loop consumer.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import numpy as np
import jax
import jax.numpy as jnp

from .config import FeatureConfig
from .models import mfcc as mfcc_model, logmel as logmel_model
from .parallel import cmvn as cmvn_lib
from .utils import batch as batch_lib
from . import runner as runner_lib


@dataclasses.dataclass
class FeatureBatch:
    """One training batch.  features is (B, T, F) f32 on device; padded
    frames (and padded rows) are zero.  uids[i] is None for padding."""
    features: jax.Array
    frame_counts: jax.Array      # (B,) int32
    mask: jax.Array              # (B, T) bool
    uids: list
    bucket: int


def load_cmvn_stats(path: str) -> cmvn_lib.Stats:
    """cmvn.npz (written by a runner pass with cfg.cmvn) -> Stats."""
    z = np.load(path)
    return cmvn_lib.Stats(count=np.float64(z["count"]),
                          sum=z["sum"].astype(np.float64),
                          sumsq=z["sumsq"].astype(np.float64))


def feature_batches(
    corpus: str,
    cfg: FeatureConfig,
    *,
    batch_size: int = 32,
    logmel: bool = False,
    backend: str = "auto",
    resample: bool = False,
    min_bucket: int = 16_000,
    max_bucket: int = 16_000 * 30,
    ladder: list | None = None,
    epochs: int = 1,
    shuffle_seed: int | None = None,
    augment_seed: int | None = None,
    augment_kwargs: dict | None = None,
    cmvn_stats: "cmvn_lib.Stats | str | None" = None,
    drop_padded_rows: bool = False,
) -> Iterator[FeatureBatch]:
    """Stream `(features, frame_counts, mask)` batches off a WAV corpus.

    - ``shuffle_seed``: reshuffle the corpus each epoch (seeded; epoch is
      folded in so order differs across epochs but reruns reproduce).
    - ``augment_seed``: apply SpecAugment on device with a per-(epoch,
      batch) PRNGKey; ``augment_kwargs`` forwards mask policy knobs.
    - ``cmvn_stats``: Stats or path to a runner-written cmvn.npz; applied
      on device before augmentation (normalize-then-mask, the standard
      training order).
    - ``drop_padded_rows``: emit remainder batches trimmed on the host
      instead of padded (dynamic shape — only for non-jit consumers).
    """
    cfg.validate()
    fn = (logmel_model.log_mel_batch_jit if logmel
          else mfcc_model.mfcc_batch_jit)
    ladder = ladder or batch_lib.bucket_ladder(min_bucket, max_bucket)
    paths = runner_lib.collect_wavs(corpus)
    if isinstance(cmvn_stats, str):
        cmvn_stats = load_cmvn_stats(cmvn_stats)
    mean = inv_std = None
    if cmvn_stats is not None:
        m, v = cmvn_stats.mean_var()
        mean = jnp.asarray(m, jnp.float32)
        inv_std = jnp.asarray(1.0 / np.sqrt(v), jnp.float32)

    if augment_seed is not None:
        from .ops.augment import spec_augment_jit
        akw = dict(augment_kwargs or {})

    for epoch in range(epochs):
        epoch_paths = list(paths)
        if shuffle_seed is not None:
            np.random.default_rng((shuffle_seed, epoch)).shuffle(epoch_paths)
        infos = runner_lib._probe(epoch_paths, cfg, None, resample)
        for bi, pb in enumerate(batch_lib.make_path_batches(
                infos, batch_size, ladder)):
            audio, lengths = runner_lib._decode_batch(pb, cfg, resample)
            feat, flens, mask = fn(jnp.asarray(audio), jnp.asarray(lengths),
                                   cfg, backend)
            if mean is not None:
                feat = jnp.where(mask[..., None],
                                 (feat - mean) * inv_std, 0.0)
            if augment_seed is not None:
                key = jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(augment_seed),
                                       epoch), bi)
                feat = spec_augment_jit(feat, key, num_frames=flens, **akw)
            uids = list(pb.paths)
            if drop_padded_rows:
                n_real = sum(1 for u in uids if u is not None)
                feat, flens, mask = (feat[:n_real], flens[:n_real],
                                     mask[:n_real])
                uids = uids[:n_real]
            yield FeatureBatch(features=feat, frame_counts=flens, mask=mask,
                               uids=uids, bucket=pb.bucket)
