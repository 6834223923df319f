"""Committed golden features (SURVEY.md §7 step 1): freeze the numerical
contract.  If these fail, the oracle's definition drifted — that is a
breaking change to every downstream consumer and must be deliberate."""

import os

import numpy as np
import jax.numpy as jnp

from mfcc_tpu import FeatureConfig, oracle
from mfcc_tpu.models import mfcc as mfcc_model, logmel as logmel_model
from mfcc_tpu.utils import wav

HERE = os.path.join(os.path.dirname(__file__), "golden")


def _audio():
    x, sr = wav.read_wav(os.path.join(HERE, "speech2s.wav"))
    assert sr == 16000
    return x


def test_oracle_matches_golden_mfcc13():
    got = oracle.mfcc(_audio().astype(np.float64), FeatureConfig())
    want = np.load(os.path.join(HERE, "mfcc13.npy"))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_oracle_matches_golden_variants():
    x64 = _audio().astype(np.float64)
    got = oracle.mfcc(x64, FeatureConfig(lifter=22, append_energy=True))
    want = np.load(os.path.join(HERE, "mfcc13_energy_lifter.npy"))
    np.testing.assert_allclose(got, want, atol=1e-12)
    got = oracle.log_mel(x64, FeatureConfig(n_mels=80, n_mfcc=80, deltas=True))
    want = np.load(os.path.join(HERE, "logmel80_deltas.npy"))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_jax_pipeline_matches_golden():
    x = _audio()
    got = np.asarray(mfcc_model.mfcc_jit(jnp.asarray(x), FeatureConfig()))
    want = np.load(os.path.join(HERE, "mfcc13.npy"))
    np.testing.assert_allclose(got, want, atol=1e-4)
    cfg = FeatureConfig(n_mels=80, n_mfcc=80, deltas=True)
    got = np.asarray(logmel_model.log_mel_jit(jnp.asarray(x), cfg))
    want = np.load(os.path.join(HERE, "logmel80_deltas.npy"))
    # 1e-3: conservative f32 bound for unbounded-range 80-mel log
    # (valley error ~2*eps*sqrt(P_peak/P_valley); BASELINE.md note)
    np.testing.assert_allclose(got, want, atol=1e-3)
