"""Ragged-length bucketing and padding (host side).

Recompilation discipline (SURVEY.md §7 hard part 3): jit specializes on
shapes, so arbitrary utterance lengths would trigger a compile per length.
Utterances are therefore grouped into a small fixed ladder of padded
lengths (geometric buckets) and fixed batch sizes; the number of distinct
compiled programs is bounded by ``len(buckets)``.

This is the TPU-native replacement for the reference's growable vector
container (``/root/reference/src/mfcc/vector.c:30-39``): where the C code
amortizes reallocation by doubling capacity, we amortize recompilation by
doubling padded shapes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Iterator, Sequence

import numpy as np


def bucket_ladder(min_samples: int, max_samples: int,
                  growth: float = 2.0) -> list[int]:
    """Geometric ladder of padded sample lengths covering [min, max]."""
    out = [int(min_samples)]
    while out[-1] < max_samples:
        out.append(int(np.ceil(out[-1] * growth)))
    return out


def pick_bucket(n: int, ladder: Sequence[int]) -> int:
    """Smallest ladder entry >= n (last entry if none)."""
    for b in ladder:
        if n <= b:
            return b
    return ladder[-1]


@dataclass
class PaddedBatch:
    """One host-side padded batch ready for device transfer."""
    audio: np.ndarray       # (B, L_bucket) float32
    lengths: np.ndarray     # (B,) int32 true sample counts
    ids: list               # opaque per-utterance keys (paths, indices)

    @property
    def batch_size(self) -> int:
        return self.audio.shape[0]


@dataclass
class PathBatch:
    """A batch of file paths grouped by bucket (decode deferred).

    ``paths`` always has exactly ``batch_size`` entries; trailing Nones
    pad remainder batches so the device sees ONE (batch, bucket) shape
    per bucket — a variable remainder batch would be a fresh XLA compile
    (minutes each through a remote-compile relay).
    """
    bucket: int
    paths: list  # of str | None

    @property
    def batch_size(self) -> int:
        return len(self.paths)


def make_path_batches(infos: Iterable[tuple[str, int]],
                      batch_size: int,
                      ladder: Sequence[int]) -> Iterator[PathBatch]:
    """Group (path, n_samples) pairs into bucketed path batches.

    The production ingestion path: lengths come from a header-only probe
    (utils/wav.wav_info), so bucketing costs no decoding; the native
    threaded loader then decodes each batch straight into its padded
    matrix (native.read_wavs_padded).
    """
    pending: dict[int, list[str]] = {b: [] for b in ladder}
    for path, n in infos:
        b = pick_bucket(min(n, ladder[-1]), ladder)
        pending[b].append(path)
        if len(pending[b]) == batch_size:
            yield PathBatch(bucket=b, paths=pending[b])
            pending[b] = []
    for b, items in pending.items():
        if items:
            items = items + [None] * (batch_size - len(items))
            yield PathBatch(bucket=b, paths=items)


def make_batches(utterances: Iterable[tuple[object, np.ndarray]],
                 batch_size: int,
                 ladder: Sequence[int] | None = None,
                 min_bucket: int = 16_000,
                 max_bucket: int = 16_000 * 30,
                 drop_overlong: bool = False) -> Iterator[PaddedBatch]:
    """Group (id, float32 signal) pairs into shape-bucketed padded batches.

    Utterances accumulate per bucket; a batch is emitted whenever a bucket
    fills.  Remainders are flushed at the end *padded to full batch_size*
    (with zero-length rows) so batch shape is constant too.  Overlong
    signals are truncated to the top bucket unless drop_overlong.
    """
    if ladder is None:
        ladder = bucket_ladder(min_bucket, max_bucket)
    pending: dict[int, list[tuple[object, np.ndarray]]] = {b: [] for b in ladder}

    def emit(bucket: int, items: list) -> PaddedBatch:
        B = batch_size
        audio = np.zeros((B, bucket), np.float32)
        lengths = np.zeros((B,), np.int32)
        ids = []
        for i, (uid, sig) in enumerate(items):
            audio[i, : len(sig)] = sig
            lengths[i] = len(sig)
            ids.append(uid)
        return PaddedBatch(audio=audio, lengths=lengths, ids=ids)

    for uid, sig in utterances:
        if len(sig) > ladder[-1]:
            if drop_overlong:
                continue
            sig = sig[: ladder[-1]]
        b = pick_bucket(len(sig), ladder)
        pending[b].append((uid, sig))
        if len(pending[b]) == batch_size:
            yield emit(b, pending[b])
            pending[b] = []
    for b, items in pending.items():
        if items:
            yield emit(b, items)
