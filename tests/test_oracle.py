"""Oracle self-validation: cross-check the float64 reference against
independent implementations (scipy/numpy) of each mathematical definition.

The oracle is the trust root of the whole framework (SURVEY.md §0.2), so it
gets its own adversarial test layer before anything is compared against it.
"""

import numpy as np
import scipy.fft
import scipy.signal
import pytest

from mfcc_tpu import FeatureConfig, oracle


CFG = FeatureConfig()


def test_window_matches_numpy():
    np.testing.assert_allclose(
        oracle.window_fn("hamming", 400), np.hamming(400), atol=1e-12)
    np.testing.assert_allclose(
        oracle.window_fn("hann", 400), np.hanning(400), atol=1e-12)


def test_dct_matrix_matches_scipy():
    mat = oracle.dct_matrix(13, 26)
    eye = np.eye(26)
    ref = scipy.fft.dct(eye, type=2, norm="ortho", axis=0)[:13]
    np.testing.assert_allclose(mat, ref, atol=1e-12)


def test_dct_matrix_orthonormal():
    full = oracle.dct_matrix(26, 26)
    np.testing.assert_allclose(full @ full.T, np.eye(26), atol=1e-12)


def test_mel_scale_roundtrip():
    f = np.linspace(0, 8000, 100)
    for scale in ("htk", "slaney"):
        np.testing.assert_allclose(
            oracle.mel_to_hz(oracle.hz_to_mel(f, scale), scale), f, atol=1e-8)


def test_htk_mel_known_value():
    # 1000 Hz is 1000 mel by construction of the HTK formula's constant:
    # 2595*log10(1+1000/700) = 999.98... (the classic approximate anchor).
    assert abs(oracle.hz_to_mel(1000.0, "htk") - 1000.0) < 0.02


def test_mel_filterbank_shape_and_coverage():
    fb = oracle.mel_filterbank(CFG)
    assert fb.shape == (CFG.n_mels, CFG.n_bins)
    assert np.all(fb >= 0)
    # every filter has some mass; interior bins are covered by >= 1 filter
    assert np.all(fb.sum(axis=1) > 0)
    # interior bins (away from the fmin/fmax edges) are covered >= 1 filter
    assert np.all(fb.sum(axis=0)[8:-8] > 0)


def test_power_spectrum_matches_scipy_stft():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4000)
    cfg = CFG.replace(preemph=0.0)
    frames = oracle.frame_signal(x, cfg)
    power = oracle.power_spectrum(frames, cfg)
    w = np.hamming(cfg.frame_len)
    for t in range(frames.shape[0]):
        ref = np.abs(np.fft.rfft(frames[t] * w, n=cfg.n_fft)) ** 2
        np.testing.assert_allclose(power[t], ref, atol=1e-9)


def test_framing_counts():
    assert CFG.frame_len == 400 and CFG.hop_len == 160
    assert CFG.num_frames(400) == 1
    assert CFG.num_frames(399) == 0
    assert CFG.num_frames(16000) == 98
    assert CFG.num_frames(560) == 2


def test_preemphasis_streaming_identity():
    """Per-frame preemph from signal == preemph of whole signal then frame."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal(2000)
    frames = oracle.frame_signal(x, CFG)
    y = np.concatenate([[x[0] - CFG.preemph * x[0]],
                        x[1:] - CFG.preemph * x[:-1]])
    cfg0 = CFG.replace(preemph=0.0)
    frames_ref = oracle.frame_signal(y, cfg0)
    np.testing.assert_allclose(frames, frames_ref, atol=1e-12)


def test_deltas_constant_signal_zero():
    feat = np.ones((20, 13))
    np.testing.assert_allclose(oracle.deltas(feat), 0.0, atol=1e-12)


def test_deltas_linear_ramp():
    # d/dt of a linear ramp == slope, including (replicated) edges interior
    t = np.arange(30, dtype=np.float64)[:, None]
    feat = 3.0 * t * np.ones((1, 5))
    d = oracle.deltas(feat, window=2)
    np.testing.assert_allclose(d[2:-2], 3.0, atol=1e-12)


def test_mfcc_end_to_end_shapes(speechlike):
    feat = oracle.mfcc(speechlike, CFG)
    assert feat.shape == (98, 13)
    assert np.all(np.isfinite(feat))
    cfgd = CFG.replace(deltas=True)
    featd = oracle.mfcc(speechlike, cfgd)
    assert featd.shape == (98, 39)
    np.testing.assert_allclose(featd[:, :13], feat, atol=1e-12)


def test_logmel_end_to_end(speechlike):
    cfg = FeatureConfig(n_mels=80, n_mfcc=80)
    feat = oracle.log_mel(speechlike, cfg)
    assert feat.shape == (98, 80)
    assert np.all(np.isfinite(feat))


def test_cmvn_normalizes():
    rng = np.random.default_rng(2)
    feats = [rng.standard_normal((50, 13)) * 5 + 3,
             rng.standard_normal((70, 13)) * 5 + 3]
    c, s, sq = oracle.cmvn_stats(feats)
    normed = np.concatenate([oracle.apply_cmvn(f, c, s, sq) for f in feats])
    np.testing.assert_allclose(normed.mean(axis=0), 0.0, atol=1e-10)
    np.testing.assert_allclose(normed.std(axis=0), 1.0, atol=1e-6)


def test_config_validation():
    with pytest.raises(ValueError):
        FeatureConfig(window="blackman").validate()
    with pytest.raises(ValueError):
        FeatureConfig(n_fft=256).validate()  # < frame_len 400
    with pytest.raises(ValueError):
        FeatureConfig(n_mfcc=99).validate()
    h = FeatureConfig().config_hash()
    assert h == FeatureConfig().config_hash()
    assert h != FeatureConfig(n_mels=80, n_mfcc=80).config_hash()
