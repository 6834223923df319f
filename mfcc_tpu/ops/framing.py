"""Framing + pre-emphasis + analysis window (JAX).

This stage turns raw PCM into overlapping analysis frames — the front of the
pipeline, analogous to the reference compiler's lexer turning raw chars into
tokens (``/root/reference/src/mfcc/lex.c:76-98``), but vectorized: instead of
a sequential char loop we build a static (T, frame_len) gather index once at
trace time and let XLA lower it to an efficient strided load.

All functions are shape-static under ``jax.jit`` (signal length is a trace
constant), which is what keeps the whole pipeline recompile-free.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import FeatureConfig
from .. import oracle


def build_window(cfg: FeatureConfig) -> np.ndarray:
    """Float64 analysis window (constant; folded into the DFT matrices)."""
    return oracle.window_fn(cfg.window, cfg.frame_len)


def frame_indices(n_samples: int, cfg: FeatureConfig) -> np.ndarray:
    """(T, frame_len) int32 gather indices for 'valid' framing."""
    T = cfg.num_frames(n_samples)
    starts = np.arange(T, dtype=np.int32) * cfg.hop_len
    return starts[:, None] + np.arange(cfg.frame_len, dtype=np.int32)[None, :]


def preemphasize(x: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Whole-signal pre-emphasis y[n] = x[n] - a*x[n-1], y[0] = (1-a)x[0].

    Identical to per-frame pre-emphasis with signal predecessors (the
    oracle's definition — equivalence pinned by
    tests/test_oracle.py::test_preemphasis_streaming_identity), which is
    what lets the blocked spectrum path skip frame materialization.
    """
    if cfg.preemph == 0.0:
        return x
    prev = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    return x - jnp.asarray(cfg.preemph, x.dtype) * prev


def frame(x: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """(n_samples,) -> (T, frame_len) pre-emphasized frames.

    Pre-emphasis predecessor comes from the *signal* (HTK x[-1] := x[0]
    convention at the start), matching oracle.frame_signal exactly, so
    chunked/streaming framing is bit-identical to batch framing.
    """
    idx = frame_indices(x.shape[-1], cfg)
    frames = x[..., idx]
    if cfg.preemph > 0.0:
        prev = x[..., np.maximum(idx - 1, 0)]
        frames = frames - jnp.asarray(cfg.preemph, x.dtype) * prev
    return frames


def frame_batch(x: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """(B, n_samples) -> (B, T, frame_len); same semantics as frame()."""
    return frame(x, cfg)


def log_energy(frames: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """(..., T, frame_len) -> (..., T) floored log frame energy."""
    from . import xmath
    e = jnp.sum(frames * frames, axis=-1)
    return xmath.floored_log(e.astype(jnp.float32), cfg.log_floor)
