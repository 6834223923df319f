"""Delta / delta-delta features (JAX), padding-aware.

Standard regression deltas over the time axis:

    d[t] = sum_{n=1..D} n * (c[t+n] - c[t-n]) / (2 * sum n^2)

with *edge replication at the true utterance boundary*: for ragged batches
the neighbor index is clipped to [0, length-1] per utterance, so padded
frames never leak into the derivatives of real frames.  Implemented as a
static gather (indices depend only on shapes + lengths), which XLA fuses
into a handful of vector ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import FeatureConfig


def deltas(feat: jnp.ndarray, window: int = 2,
           lengths: jnp.ndarray | None = None) -> jnp.ndarray:
    """(..., T, F) -> (..., T, F) regression deltas.

    lengths: optional (...,) int array of true frame counts; neighbor
    indices are clipped to length-1 (edge replication at the ragged edge).
    Without lengths, edges replicate at 0 and T-1.
    """
    T = feat.shape[-2]
    denom = 2.0 * sum(n * n for n in range(1, window + 1))
    t = jnp.arange(T, dtype=jnp.int32)
    if lengths is None:
        hi_cap = T - 1
    else:
        hi_cap = jnp.maximum(lengths, 1).astype(jnp.int32) - 1
        hi_cap = hi_cap[..., None]  # broadcast over time axis
    out = jnp.zeros_like(feat)
    for n in range(1, window + 1):
        fwd = jnp.minimum(t + n, hi_cap)
        bwd = jnp.maximum(t - n, 0)
        if lengths is None:
            plus = feat[..., fwd, :]
            minus = feat[..., bwd, :]
        else:
            plus = jnp.take_along_axis(feat, fwd[..., None], axis=-2)
            bwd_b = jnp.broadcast_to(bwd, fwd.shape)
            minus = jnp.take_along_axis(feat, bwd_b[..., None], axis=-2)
        out = out + n * (plus - minus)
    return out / jnp.asarray(denom, feat.dtype)


def append_deltas(feat: jnp.ndarray, cfg: FeatureConfig,
                  lengths: jnp.ndarray | None = None) -> jnp.ndarray:
    """(..., T, F) -> (..., T, 3F): [static, delta, delta-delta]."""
    d1 = deltas(feat, cfg.delta_window, lengths)
    d2 = deltas(d1, cfg.delta_window, lengths)
    return jnp.concatenate([feat, d1, d2], axis=-1)
