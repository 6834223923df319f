"""Chunked device->host transfer.

Some transports (notably the remote-relay PJRT used in this environment)
collapse on large single device->host reads (~0.03 MB/s for 4 MB) while
sustaining ~15 MB/s for ~1 MB jit-sliced chunks — a 500x difference,
measured.  ``chunked_to_numpy`` fetches a device array through fixed-size
dynamic slices of its flat view: one compiled slice program total
(dynamic start, static size), byte-exact result.

On healthy PCIe transports the chunking adds only a few dispatches per
array; the threshold skips it entirely for small arrays.  Opt out with
MFCC_TPU_CHUNKED_FETCH=0.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax


_CHUNK_BYTES = 1 << 20            # ~1 MB: measured sweet spot on the relay
_THRESHOLD_BYTES = 2 << 20        # fetch smaller arrays in one piece


@functools.partial(jax.jit, static_argnames=("size",))
def _slice(flat, start, size):
    return jax.lax.dynamic_slice(flat, (start,), (size,))


def enabled() -> bool:
    return os.environ.get("MFCC_TPU_CHUNKED_FETCH", "1") != "0"


def chunked_to_numpy(arr) -> np.ndarray:
    """Device array -> numpy, via ~1 MB chunks for large arrays."""
    if not enabled() or arr.nbytes <= _THRESHOLD_BYTES:
        return np.asarray(arr)
    n = max(_CHUNK_BYTES // arr.dtype.itemsize, 1)
    flat = arr.reshape(-1)
    L = flat.shape[0]
    out = np.empty((L,), arr.dtype)
    off = 0
    while off < L:
        # fixed-size slice; dynamic_slice clamps the start so the final
        # chunk re-reads a little overlap instead of changing shape
        start = min(off, L - n) if L >= n else 0
        chunk = np.asarray(_slice(flat, start, min(n, L)))
        out[start: start + chunk.shape[0]] = chunk
        off = start + chunk.shape[0]
    return out.reshape(arr.shape)
