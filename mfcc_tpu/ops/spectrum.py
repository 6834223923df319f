"""GEMM-native real DFT power spectrum (JAX).

The load-bearing TPU design decision (SURVEY.md §7 step 4): instead of a
butterfly FFT — which lowers poorly on TPU and wastes the MXU — the windowed
``n_fft``-point real DFT of a ``frame_len``-sample frame is exactly

    Re[k] = sum_n  x[n] * w[n] * cos(2*pi*n*k/n_fft)
    Im[k] = -sum_n x[n] * w[n] * sin(2*pi*n*k/n_fft)      (n < frame_len)

i.e. two dense (frame_len, n_bins) matmuls with the analysis window folded
into the matrices.  At MFCC sizes (400 x 257) a dense DFT-as-GEMM runs on the
128x128 systolic array at full utilization and beats any radix decomposition
(GEMM-native NDFT; cf. the MelT / FlashFFTConv line in PAPERS.md).  Zero
padding to ``n_fft`` is implicit: rows n >= frame_len of the DFT basis are
simply never materialized.

The matrices are NumPy float64 constants built once per config and closed
over at trace time, so XLA constant-folds and keeps them resident.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..config import FeatureConfig
from .framing import build_window


@functools.lru_cache(maxsize=32)
def _dft_matrices_cached(key) -> tuple[np.ndarray, np.ndarray]:
    frame_len, n_fft, window = key
    n = np.arange(frame_len, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    from .. import oracle
    w = oracle.window_fn(window, frame_len)[:, None]
    return w * np.cos(ang), w * np.sin(ang)


def dft_matrices(cfg: FeatureConfig) -> tuple[np.ndarray, np.ndarray]:
    """(frame_len, n_bins) float64 window-folded cos/sin DFT bases."""
    return _dft_matrices_cached((cfg.frame_len, cfg.n_fft, cfg.window))


def power_spectrum(
    frames: jnp.ndarray,
    cfg: FeatureConfig,
    *,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """(..., T, frame_len) pre-emphasized frames -> (..., T, n_bins) |X|^2.

    float32 accumulation with HIGHEST matmul precision by default: a single
    bf16 MXU pass has ~2^-8 relative error which, pushed through log(), blows
    the 1e-4 feature tolerance; HIGHEST keeps full f32 fidelity while still
    running on the MXU.
    """
    cos_m, sin_m = dft_matrices(cfg)
    dt = jnp.dtype(cfg.compute_dtype)
    c = jnp.asarray(cos_m, dt)
    s = jnp.asarray(sin_m, dt)
    f = frames.astype(dt)
    re = jnp.matmul(f, c, precision=precision)
    im = jnp.matmul(f, s, precision=precision)
    acc = jnp.dtype(cfg.accum_dtype)
    re = re.astype(acc)
    im = im.astype(acc)
    return re * re + im * im
