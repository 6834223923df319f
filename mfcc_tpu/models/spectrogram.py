"""Log-power spectrogram features (no mel, no DCT).

The third member of the feature family (MFCC / log-mel / spectrogram):
(T, n_bins) floored log power spectra, same framing/window/DFT contract
as the rest of the pipeline.  Useful for neural front-ends that learn
their own filterbanks downstream.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import FeatureConfig
from ..ops import framing, spectrum, xmath
from .mfcc import frame_lengths, frame_mask


def log_spectrogram(x: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """(n_samples,) -> (T, n_bins) floored log power spectrum."""
    y = framing.preemphasize(x, cfg)
    p_lo, p_hi = spectrum.power_spectrum_split(y, cfg)
    power = jnp.concatenate([p_lo, p_hi], axis=-1)
    return xmath.floored_log(power, cfg.log_floor)


def log_spectrogram_batch(x: jnp.ndarray, sample_lengths: jnp.ndarray,
                          cfg: FeatureConfig):
    """(B, N_pad), (B,) -> ((B, T, n_bins), (B,), (B, T))."""
    if x.dtype == jnp.int16:
        x = x.astype(jnp.float32) * (1.0 / 32768.0)
    feat = log_spectrogram(x, cfg)
    flens = frame_lengths(sample_lengths, cfg)
    mask = frame_mask(feat.shape[-2], flens)
    feat = jnp.where(mask[..., None], feat, 0.0)
    return feat, flens, mask


@partial(jax.jit, static_argnames=("cfg",))
def log_spectrogram_jit(x: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    return log_spectrogram(x, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def log_spectrogram_batch_jit(x: jnp.ndarray, sample_lengths: jnp.ndarray,
                              cfg: FeatureConfig):
    return log_spectrogram_batch(x, sample_lengths, cfg)
