"""Seeded dither: generator twin agreement, oracle/pipeline parity, and
streaming bit-consistency (the last §5 config knob — VERDICT r1 #7)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mfcc_tpu import FeatureConfig, oracle
from mfcc_tpu.models import mfcc as mfcc_model, streaming
from mfcc_tpu.ops import dither

CFG = FeatureConfig(dither=dither.KALDI_ONE_LSB, dither_seed=7).validate()


def test_noise_twins_agree():
    """NumPy and JAX generators draw the same realization (hash bits are
    identical uint32 arithmetic; transcendentals agree to ~f32 ulp)."""
    a = dither.noise_np(7, 0, 4096)
    b = np.asarray(dither.noise_jax(7, 0, 4096), np.float64)
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_noise_is_position_indexed():
    """noise(start=k)[j] == noise(start=0)[k+j] — the streaming contract."""
    whole = np.asarray(dither.noise_jax(3, 0, 1000))
    part = np.asarray(dither.noise_jax(3, 400, 600))
    np.testing.assert_array_equal(whole[400:], part)


def test_noise_statistics():
    z = dither.noise_np(0, 0, 1 << 18)
    assert abs(z.mean()) < 0.01
    assert abs(z.std() - 1.0) < 0.01
    # decorrelated across seeds
    z2 = dither.noise_np(1, 0, 1 << 18)
    assert abs(np.corrcoef(z, z2)[0, 1]) < 0.01


def test_dithered_pipeline_matches_oracle(rng):
    x = (rng.standard_normal(16000) * 0.3).astype(np.float32)
    got = np.asarray(mfcc_model.mfcc_jit(jnp.asarray(x), CFG))
    want = oracle.mfcc(x.astype(np.float64), CFG)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_dither_breaks_silence_floor(rng):
    """The reason dither exists: digital silence must not produce constant
    log-floor features."""
    x = np.zeros(16000, np.float32)
    f_plain = np.asarray(mfcc_model.mfcc_jit(jnp.asarray(x), FeatureConfig()))
    f_dith = np.asarray(mfcc_model.mfcc_jit(jnp.asarray(x), CFG))
    assert np.ptp(f_plain[:, 0]) == 0.0        # all frames at the floor
    assert np.ptp(f_dith[:, 0]) > 0.0          # dither broke the tie
    want = oracle.mfcc(x.astype(np.float64), CFG)
    np.testing.assert_allclose(f_dith, want, atol=1e-4)


def test_streaming_dither_matches_batch(speechlike):
    """Position-indexed noise keeps the streaming == batch contract with
    dither enabled."""
    C = 10 * CFG.hop_len
    st = streaming.init_state(CFG)
    out = []
    for k in range(len(speechlike) // C):
        st, feat, nv = streaming.process_chunk_jit(
            st, jnp.asarray(speechlike[k * C:(k + 1) * C]), CFG)
        out.append(np.asarray(feat)[: int(nv)])
    got = np.concatenate(out)
    want = np.asarray(mfcc_model.mfcc_jit(jnp.asarray(speechlike), CFG))
    np.testing.assert_allclose(got, want[: got.shape[0]], atol=1e-5)


def test_dither_validation():
    with pytest.raises(ValueError):
        FeatureConfig(dither=-1.0).validate()
    # dither changes the config hash (reproducibility consumers)
    assert (FeatureConfig().config_hash()
            != FeatureConfig(dither=1e-5).config_hash())
