"""DCT-II cepstral projection (JAX).

One GEMM with the orthonormal DCT-II matrix (built float64 by the oracle)
and the optional sinusoidal lifter *folded into the matrix columns* — the
lifter scales output coefficient i by lift[i], so (dct.T * lift) is a single
constant matrix and the lifter costs nothing at runtime.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..config import FeatureConfig
from .. import oracle
from .spectrum import resolve_precision


@functools.lru_cache(maxsize=32)
def _dct_matrix_cached(key) -> np.ndarray:
    n_mfcc, n_mels, lifter = key
    mat = oracle.dct_matrix(n_mfcc, n_mels).T  # (n_mels, n_mfcc)
    return (mat * oracle.lifter_coeffs(n_mfcc, lifter)[None, :]).copy()


def dct_matrix(cfg: FeatureConfig) -> np.ndarray:
    """(n_mels, n_mfcc) float64 lifter-folded DCT-II projection."""
    return _dct_matrix_cached((cfg.n_mfcc, cfg.n_mels, cfg.lifter))


def cepstra(
    logmel: jnp.ndarray,
    cfg: FeatureConfig,
    *,
    precision=None,
) -> jnp.ndarray:
    """(..., T, n_mels) log-mel -> (..., T, n_mfcc) liftered cepstra."""
    if precision is None:
        precision = resolve_precision(cfg)
    mat = jnp.asarray(dct_matrix(cfg), jnp.dtype(cfg.accum_dtype))
    return jnp.matmul(logmel, mat, precision=precision)
