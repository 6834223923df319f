"""Pallas kernel parity in interpret mode (the TPU 'sanitizer' run —
SURVEY.md §5): the fused kernel must match the float64 oracle within the
pipeline tolerance and the jnp path within float noise."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mfcc_tpu import FeatureConfig, oracle
from mfcc_tpu.ops import framing
from mfcc_tpu.ops.kernels import fused_mfcc
from mfcc_tpu.models import mfcc as mfcc_model

ATOL = 1e-4
CFG = FeatureConfig()


def _preemph(x):
    return jnp.asarray(framing.preemphasize(jnp.asarray(x), CFG))


def test_fused_kernel_matches_oracle(rng):
    x = (rng.standard_normal((2, 16000)) * 0.3).astype(np.float32)
    got = np.asarray(fused_mfcc.fused_features(_preemph(x), CFG,
                                               interpret=True))
    assert got.shape == (2, 98, 13)
    for b in range(2):
        want = oracle.mfcc(x[b].astype(np.float64), CFG)
        np.testing.assert_allclose(got[b], want, atol=ATOL)


def test_fused_kernel_matches_jnp_path(rng):
    x = (rng.standard_normal((3, 12000)) * 0.3).astype(np.float32)
    lens = np.full((3,), 12000, np.int32)
    got = np.asarray(fused_mfcc.fused_features(_preemph(x), CFG,
                                               interpret=True))
    want, flens, _ = mfcc_model.mfcc_batch_jit(
        jnp.asarray(x), jnp.asarray(lens), CFG)
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5)


def test_fused_kernel_non_tile_multiple_frames(rng):
    """T = 98 frames with tile 64 -> 2 tiles with padding; padded frames
    must not leak into real output."""
    x = (rng.standard_normal((1, 16000)) * 0.3).astype(np.float32)
    got = np.asarray(fused_mfcc.fused_features(
        _preemph(x), CFG, tile_t=64, interpret=True))
    want = oracle.mfcc(x[0].astype(np.float64), CFG)
    assert got.shape == (1, 98, 13)
    np.testing.assert_allclose(got[0], want, atol=ATOL)


def test_fused_kernel_logmel_mode(rng):
    cfg = FeatureConfig(n_mels=80, n_mfcc=80).validate()
    x = (rng.standard_normal((2, 8000)) * 0.3).astype(np.float32)
    y = framing.preemphasize(jnp.asarray(x), cfg)
    got = np.asarray(fused_mfcc.fused_features(
        y, cfg, apply_dct=False, interpret=True))
    assert got.shape == (2, cfg.num_frames(8000), 80)
    for b in range(2):
        want = oracle.log_mel(x[b].astype(np.float64), cfg)
        np.testing.assert_allclose(got[b], want, atol=ATOL)


def test_fused_kernel_append_energy(rng):
    cfg = CFG.replace(append_energy=True)
    x = (rng.standard_normal((1, 8000)) * 0.3).astype(np.float32)
    y = framing.preemphasize(jnp.asarray(x), cfg)
    got = np.asarray(fused_mfcc.fused_features(y, cfg, interpret=True))
    want = oracle.mfcc(x[0].astype(np.float64), cfg)
    np.testing.assert_allclose(got[0], want, atol=ATOL)


def test_fused_kernel_short_signal():
    y = jnp.zeros((1, 300), jnp.float32)     # < frame_len
    got = fused_mfcc.fused_features(y, CFG, interpret=True)
    assert got.shape == (1, 0, 13)
