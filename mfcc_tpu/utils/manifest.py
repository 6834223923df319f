"""Checkpoint / resume for corpus processing (SURVEY.md §5).

The reference has no persistence beyond its output file; pod-scale corpus
jobs need two resumable pieces of state, both tiny:

- the processing manifest: which utterances/shards are already done
  (restart-from-manifest after host failure), and
- the CMVN accumulator (count/sum/sumsq), so statistics survive restarts.

Both are plain JSON/NPZ with atomic replace — no heavyweight checkpoint
dependency for kilobytes of state.  (Model checkpoints for the trainable
front-end are plain NPZ too, models/trainable.py.)
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np


def _atomic_write(path: str, data: bytes):
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp_manifest")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        os.unlink(tmp)
        raise


class Manifest:
    """Set of completed utterance ids + run metadata, JSON on disk.

    The CMVN accumulator rides in the SAME json blob so the done-set and
    the statistics it produced are committed in one atomic replace — a
    resumed run can never see a manifest whose stats cover a different
    utterance set than its done list (VERDICT r1 weak #2).  The vectors
    are tiny (3 x n_feats floats), so JSON is fine.
    """

    def __init__(self, path: str, config_hash: str = ""):
        self.path = path
        self.config_hash = config_hash
        self.done: set[str] = set()
        self.quarantined: set[str] = set()
        self.cmvn: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None
        self.cmvn_applied = False
        if os.path.exists(path):
            with open(path) as f:
                blob = json.load(f)
            if config_hash and blob.get("config_hash") not in ("", config_hash):
                raise ValueError(
                    f"manifest {path} was written with config "
                    f"{blob.get('config_hash')}, current is {config_hash}")
            self.done = set(blob.get("done", []))
            self.quarantined = set(blob.get("quarantined", []))
            self.cmvn_applied = bool(blob.get("cmvn_applied", False))
            c = blob.get("cmvn")
            if c is not None:
                self.cmvn = (np.float64(c["count"]),
                             np.asarray(c["sum"], np.float64),
                             np.asarray(c["sumsq"], np.float64))

    def mark(self, uid: str):
        self.done.add(uid)

    def mark_quarantined(self, uid: str):
        """Record a bad/unreadable utterance so resume doesn't retry it
        forever (and the CMVN applied-guard doesn't see it as pending).
        Re-trying after fixing the file: run with resume=False."""
        self.quarantined.add(uid)

    def pending(self, uids: list[str]) -> list[str]:
        return [u for u in uids
                if u not in self.done and u not in self.quarantined]

    def set_cmvn(self, count, sum_, sumsq):
        # float64 throughout: the f32 sumsq/mean^2 cancellation measurably
        # breaks normalized-feature accuracy (see runner._host_batch_stats);
        # JSON numbers are f64 natively so the checkpoint is exact.
        self.cmvn = (np.float64(count), np.asarray(sum_, np.float64),
                     np.asarray(sumsq, np.float64))

    def save(self):
        blob = {"config_hash": self.config_hash, "done": sorted(self.done),
                "quarantined": sorted(self.quarantined),
                "cmvn_applied": self.cmvn_applied}
        if self.cmvn is not None:
            c, s, sq = self.cmvn
            blob["cmvn"] = {"count": float(c), "sum": [float(v) for v in s],
                            "sumsq": [float(v) for v in sq]}
        _atomic_write(self.path, json.dumps(blob).encode())


def save_cmvn(path: str, stats, config_hash: str = ""):
    """Persist a parallel.cmvn.Stats pytree as NPZ (atomic)."""
    import io as _io
    buf = _io.BytesIO()
    np.savez(buf, count=np.asarray(stats.count), sum=np.asarray(stats.sum),
             sumsq=np.asarray(stats.sumsq),
             config_hash=np.asarray(config_hash))
    _atomic_write(path, buf.getvalue())


def load_cmvn(path: str, config_hash: str = ""):
    from ..parallel.cmvn import Stats
    with np.load(path) as z:
        if config_hash and str(z["config_hash"]) not in ("", config_hash):
            raise ValueError("CMVN stats were computed under a different config")
        return Stats(count=z["count"], sum=z["sum"], sumsq=z["sumsq"])
