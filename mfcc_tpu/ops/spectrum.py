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


_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,       # bf16x3 f32 emulation on MXU
    "highest": jax.lax.Precision.HIGHEST, # bf16x6
}


def resolve_precision(cfg: FeatureConfig):
    return _PRECISIONS[cfg.matmul_precision]


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


def hop_block_views(y: jnp.ndarray, cfg: FeatureConfig):
    """Reshape a pre-emphasized signal into non-overlapping hop blocks.

    (..., N) -> (..., R, hop) with R = N // hop.  The hop-block
    decomposition below (power_spectrum_blocked) reads frames out of this
    contiguous view with *static slices only* — no per-frame gather.
    """
    hop = cfg.hop_len
    R = y.shape[-1] // hop
    return y[..., : R * hop].reshape(*y.shape[:-1], R, hop)


def power_spectrum_blocked_split(
    x: jnp.ndarray,
    cfg: FeatureConfig,
    *,
    precision=None,
):
    """Lane-exact variant: returns (power_lo (..., T, n_bins-1), power_hi
    (..., T, 1)) with the top (Nyquist, for even n_fft) bin split out.

    Rationale: n_bins = n_fft/2 + 1 = 257 forces the MXU to pad the DFT
    GEMM's output to 384 lanes — 50% wasted columns.  The top bin costs
    one extra (frame_len, 1) dot (its sine column is identically zero for
    even n_fft), so computing 256 + 1 keeps the big GEMM at exactly two
    128-lane tiles.  Consumers either concat (power_spectrum_blocked) or
    fold the split bin directly into the mel projection
    (mel.log_mel_energies_split) without materializing the concat.
    """
    q, r = divmod(cfg.frame_len, cfg.hop_len)
    hop = cfg.hop_len
    blocks = hop_block_views(x, cfg)
    T = cfg.num_frames(x.shape[-1])
    acc = jnp.dtype(cfg.accum_dtype)
    if T <= 0:
        z = jnp.zeros((*x.shape[:-1], 0, cfg.n_bins - 1), acc)
        return z, jnp.zeros((*x.shape[:-1], 0, 1), acc)

    if precision is None:
        precision = resolve_precision(cfg)
    cos_m, sin_m = dft_matrices(cfg)
    nb = cfg.n_bins - 1
    dt = jnp.dtype(cfg.compute_dtype)
    c = jnp.asarray(cos_m[:, :nb], dt)
    s = jnp.asarray(sin_m[:, :nb], dt)
    chi = jnp.asarray(cos_m[:, nb:], dt)       # (frame_len, 1)
    shi = jnp.asarray(sin_m[:, nb:], dt)       # zero for even n_fft
    blocks = blocks.astype(dt)

    re = im = rehi = imhi = None
    even_nfft = cfg.n_fft % 2 == 0

    def acc_add(a, b):
        return b if a is None else a + b

    for k in range(q + (1 if r else 0)):
        width = hop if k < q else r
        v = blocks[..., k: k + T, :width]
        lo = k * hop
        re = acc_add(re, jnp.matmul(v, c[lo: lo + width],
                                    precision=precision))
        im = acc_add(im, jnp.matmul(v, s[lo: lo + width],
                                    precision=precision))
        rehi = acc_add(rehi, jnp.matmul(v, chi[lo: lo + width],
                                        precision=precision))
        if not even_nfft:
            imhi = acc_add(imhi, jnp.matmul(v, shi[lo: lo + width],
                                            precision=precision))
    re = re.astype(acc)
    im = im.astype(acc)
    rehi = rehi.astype(acc)
    p_lo = re * re + im * im
    p_hi = rehi * rehi
    if not even_nfft:
        imhi = imhi.astype(acc)
        p_hi = p_hi + imhi * imhi
    return p_lo, p_hi


def power_spectrum_blocked(
    x: jnp.ndarray,
    cfg: FeatureConfig,
    *,
    precision=None,
) -> jnp.ndarray:
    """(..., N) raw audio -> (..., T, n_bins) |X|^2 with zero frame
    materialization (the framework's load-bearing GEMM trick).

    Because frames stride by ``hop``, the frame matrix F (T, frame_len)
    factors over hop blocks: with frame_len = q*hop + r and B2 the
    (R, hop) hop-block view of the pre-emphasized signal,

        F @ M = sum_{k<q} B2[k:k+T] @ M[k*hop:(k+1)*hop]
              + B2[q:q+T, :r] @ M[q*hop:]

    i.e. q (+1 if r>0) dense GEMMs over *contiguous static slices* — no
    (T, frame_len) gather/materialization, ~3x less HBM traffic, and the
    same decomposition drives the fused Pallas kernel (kernels/fused_mfcc).
    """
    q, r = divmod(cfg.frame_len, cfg.hop_len)
    hop = cfg.hop_len
    y = x  # caller applies pre-emphasis (framing.preemphasize)
    blocks = hop_block_views(y, cfg)
    R = blocks.shape[-2]
    T = cfg.num_frames(y.shape[-1])
    if T <= 0:
        return jnp.zeros((*y.shape[:-1], 0, cfg.n_bins), jnp.dtype(cfg.accum_dtype))

    if precision is None:
        precision = resolve_precision(cfg)
    cos_m, sin_m = dft_matrices(cfg)
    dt = jnp.dtype(cfg.compute_dtype)
    acc = jnp.dtype(cfg.accum_dtype)
    c = jnp.asarray(cos_m, dt)
    s = jnp.asarray(sin_m, dt)
    blocks = blocks.astype(dt)

    re = None
    im = None
    for k in range(q):
        v = blocks[..., k: k + T, :]
        dre = jnp.matmul(v, c[k * hop: (k + 1) * hop], precision=precision)
        dim = jnp.matmul(v, s[k * hop: (k + 1) * hop], precision=precision)
        re = dre if re is None else re + dre
        im = dim if im is None else im + dim
    if r > 0:
        v = blocks[..., q: q + T, :r]
        re = re + jnp.matmul(v, c[q * hop:], precision=precision)
        im = im + jnp.matmul(v, s[q * hop:], precision=precision)
    re = re.astype(acc)
    im = im.astype(acc)
    return re * re + im * im


def log_energy_blocked(y: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """(..., N) pre-emphasized audio -> (..., T) floored log frame energy,
    via the same hop-block decomposition (no frame materialization)."""
    from . import xmath
    q, r = divmod(cfg.frame_len, cfg.hop_len)
    blocks = hop_block_views(y, cfg)
    T = cfg.num_frames(y.shape[-1])
    sq = blocks * blocks
    row = jnp.sum(sq, axis=-1)                    # (..., R)
    e = None
    for k in range(q):
        v = row[..., k: k + T]
        e = v if e is None else e + v
    if r > 0:
        e = e + jnp.sum(sq[..., q: q + T, :r], axis=-1)
    return xmath.floored_log(e.astype(jnp.float32), cfg.log_floor)


def power_spectrum(
    frames: jnp.ndarray,
    cfg: FeatureConfig,
    *,
    precision=None,
) -> jnp.ndarray:
    """(..., T, frame_len) pre-emphasized frames -> (..., T, n_bins) |X|^2.

    float32 accumulation with HIGHEST matmul precision by default: a single
    bf16 MXU pass has ~2^-8 relative error which, pushed through log(), blows
    the 1e-4 feature tolerance; HIGHEST keeps full f32 fidelity while still
    running on the MXU.
    """
    if precision is None:
        precision = resolve_precision(cfg)
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
