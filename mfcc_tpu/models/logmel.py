"""Log-mel filterbank variant (DCT skipped) — baseline config 3.

Identical front half to the MFCC pipeline; stops at floored log mel
energies and optionally appends delta / delta-delta.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import FeatureConfig
from ..ops import framing, spectrum, mel, deltas as deltas_op
from .mfcc import frame_lengths, frame_mask


def log_mel(x: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """(n_samples,) -> (T, n_mels[*3]) log-mel features."""
    y = framing.preemphasize(x, cfg)
    feat = mel.log_mel_energies(spectrum.power_spectrum_blocked(y, cfg), cfg)
    if cfg.deltas:
        feat = deltas_op.append_deltas(feat, cfg)
    return feat


def log_mel_batch(x: jnp.ndarray, sample_lengths: jnp.ndarray,
                  cfg: FeatureConfig):
    """(B, N_pad), (B,) -> ((B, T, n_mels[*3]), (B,), (B, T))."""
    y = framing.preemphasize(x, cfg)
    flens = frame_lengths(sample_lengths, cfg)
    feat = mel.log_mel_energies(spectrum.power_spectrum_blocked(y, cfg), cfg)
    if cfg.deltas:
        feat = deltas_op.append_deltas(feat, cfg, flens)
    mask = frame_mask(feat.shape[-2], flens)
    feat = jnp.where(mask[..., None], feat, 0.0)
    return feat, flens, mask


@partial(jax.jit, static_argnames=("cfg",))
def log_mel_jit(x: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    return log_mel(x, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def log_mel_batch_jit(x: jnp.ndarray, sample_lengths: jnp.ndarray,
                      cfg: FeatureConfig):
    return log_mel_batch(x, sample_lengths, cfg)
