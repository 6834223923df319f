"""Seeded, reproducible dither (SURVEY.md §5 config list; VERDICT r1 #7).

Dither adds tiny Gaussian noise to the waveform so digital silence and
exact-zero mel energies never hit the log floor discontinuously (Kaldi
applies it by default with magnitude 1 LSB of 16-bit PCM).  Two design
choices differ from Kaldi, both deliberate:

- **Signal-domain, not frame-domain**: Kaldi dithers each materialized
  frame independently; this framework never materializes frames (the
  hop-block GEMM decomposition is the whole point), so noise is added to
  the signal once, indexed by ABSOLUTE sample position.  This also makes
  streaming bit-consistent with batch: a chunk at sample offset k draws
  exactly the noise batch processing would have drawn there.
- **Counter-based, not sequential RNG**: noise[i] is a pure function of
  (seed, i) via an integer avalanche hash + Box-Muller, implemented
  twice — NumPy (oracle) and JAX (pipeline) — over bit-identical uint32
  arithmetic.  The transcendental steps (log/sqrt/cos) may differ by
  ~f32 ulp between backends; at dither amplitudes (~3e-5) that is
  O(1e-11) absolute on the signal, far below the 1e-4 feature contract.
  Agreement is pinned by tests/test_dither.py.

Units: ``cfg.dither`` is the noise RMS in the input convention ([-1, 1]
floats).  Kaldi's default ``--dither=1`` (1 LSB int16) corresponds to
``dither = 1/32768 ~= 3.05e-5``, exposed as :data:`KALDI_ONE_LSB`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import FeatureConfig

KALDI_ONE_LSB = 1.0 / 32768.0

_C1 = np.uint32(0x85EBCA6B)   # murmur3 finalizer constants
_C2 = np.uint32(0xC2B2AE35)
_PHI = np.uint32(0x9E3779B9)  # golden-ratio stream separator


def _mix_np(h: np.ndarray) -> np.ndarray:
    h = h.astype(np.uint32)
    h ^= h >> np.uint32(16)
    h *= _C1
    h ^= h >> np.uint32(13)
    h *= _C2
    h ^= h >> np.uint32(16)
    return h


def _mix_jax(h):
    h = h.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(int(_C1))
    h = h ^ (h >> 13)
    h = h * jnp.uint32(int(_C2))
    h = h ^ (h >> 16)
    return h


def _bits_to_unit_np(h: np.ndarray) -> np.ndarray:
    """uint32 -> float in [2^-25, 1): top 24 bits as a fixed-point fraction
    (exactly representable in f32), floored away from zero for log()."""
    u = (h >> np.uint32(8)).astype(np.float64) * 2.0 ** -24
    return np.maximum(u, 2.0 ** -25)


def _bits_to_unit_jax(h):
    u = (h >> 8).astype(jnp.float32) * jnp.float32(2.0 ** -24)
    return jnp.maximum(u, jnp.float32(2.0 ** -25))


def noise_np(seed: int, start: int, n: int) -> np.ndarray:
    """Unit-variance Gaussian noise for samples [start, start+n) (float64
    pipeline, f32-faithful inputs) — the oracle-side twin of noise_jax."""
    idx = (np.arange(start, start + n, dtype=np.int64)
           & 0xFFFFFFFF).astype(np.uint32)
    seed_mix = (int(seed) & 0xFFFFFFFF) * int(_PHI) & 0xFFFFFFFF
    base = _mix_np(idx + np.uint32(seed_mix))
    h1 = _mix_np(base ^ np.uint32(0x6C8E9CF5))
    h2 = _mix_np(base ^ np.uint32(0x94D049BB))
    u1 = _bits_to_unit_np(h1)
    u2 = _bits_to_unit_np(h2)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def noise_jax(seed: int, start, n: int):
    """JAX twin of noise_np; ``start`` may be a traced int32 scalar (the
    streaming path passes state.samples_seen)."""
    idx = jnp.asarray(start, jnp.uint32) + jnp.arange(n, dtype=jnp.uint32)
    seed_mix = (int(seed) & 0xFFFFFFFF) * int(_PHI) & 0xFFFFFFFF
    base = _mix_jax(idx + jnp.uint32(seed_mix))
    h1 = _mix_jax(base ^ jnp.uint32(0x6C8E9CF5))
    h2 = _mix_jax(base ^ jnp.uint32(0x94D049BB))
    u1 = _bits_to_unit_jax(h1)
    u2 = _bits_to_unit_jax(h2)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
        jnp.float32(2.0 * np.pi) * u2)


def apply_np(x: np.ndarray, cfg: FeatureConfig) -> np.ndarray:
    """Oracle-side dither: x (float64, 1-D) + cfg.dither * noise."""
    if cfg.dither == 0.0:
        return x
    return x + cfg.dither * noise_np(cfg.dither_seed, 0, x.shape[-1])


def apply_jax(x: jnp.ndarray, cfg: FeatureConfig, start=0) -> jnp.ndarray:
    """Pipeline-side dither; broadcasts one noise stream over leading batch
    dims (noise is per-POSITION by design — see module docstring).
    ``start`` is the absolute sample index of x[..., 0] (streaming)."""
    if cfg.dither == 0.0:
        return x
    nz = noise_jax(cfg.dither_seed, start, x.shape[-1])
    return x + jnp.asarray(cfg.dither, x.dtype) * nz.astype(x.dtype)
