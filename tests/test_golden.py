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


def test_oracle_matches_golden_r4_families():
    """PLP / spectrogram / pitch conventions frozen (r4): the oracle
    definition of every feature family is now golden-pinned."""
    from mfcc_tpu.config import PitchConfig
    x64 = _audio().astype(np.float64)
    got = oracle.plp(x64, FeatureConfig())
    np.testing.assert_allclose(
        got, np.load(os.path.join(HERE, "plp13.npy")), atol=1e-12)
    got = oracle.log_spectrogram(x64, FeatureConfig())
    np.testing.assert_allclose(
        got, np.load(os.path.join(HERE, "spectrogram257.npy")), atol=1e-12)
    got = oracle.pitch(x64, PitchConfig().validate())
    np.testing.assert_allclose(
        got, np.load(os.path.join(HERE, "pitch3.npy")), atol=1e-12)


def test_jax_pipeline_matches_golden_r4_families():
    """The f32 pipelines against the frozen goldens (family contracts:
    PLP strict 1e-4; spectrogram windowed; pitch per-column)."""
    from mfcc_tpu.config import PitchConfig
    from mfcc_tpu.models import plp as plp_model, spectrogram as spec_model
    from mfcc_tpu.models import pitch as pitch_model
    x = _audio()
    got = np.asarray(plp_model.plp_jit(jnp.asarray(x), FeatureConfig()))
    np.testing.assert_allclose(
        got, np.load(os.path.join(HERE, "plp13.npy")), atol=1e-4)
    got = np.asarray(spec_model.log_spectrogram_jit(
        jnp.asarray(x), FeatureConfig()))
    want = np.load(os.path.join(HERE, "spectrogram257.npy"))
    keep = want > (want.max(axis=1, keepdims=True) - np.log(10.0 ** 5))
    # 2e-4: the honest windowed contract for BOTH backends — real speech
    # (this golden) drives the XLA path to 1.7e-4 in the 50 dB window
    # (f32 summation error scales with frame length beyond the naive
    # 2*eps*10^(db/20) bound; docs/conventions.md)
    assert np.abs(got[keep] - want[keep]).max() < 2e-4
    pcfg = PitchConfig().validate()
    got = np.asarray(pitch_model.pitch_jit(jnp.asarray(x), pcfg))
    want = np.load(os.path.join(HERE, "pitch3.npy"))
    for i, tol in enumerate((1e-4, 3e-4, 1e-4)):   # pov, norm, delta
        assert np.abs(got[:, i] - want[:, i]).max() < tol, i


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
