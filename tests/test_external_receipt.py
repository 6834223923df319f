"""External oracle cross-validation (closes SURVEY.md §0.2's promise,
VERDICT r4 #7): the oracle's conventions diffed against an INDEPENDENT
widely-deployed implementation — ``transformers.audio_utils`` (Hugging
Face's port of the librosa/Kaldi feature conventions, baked into this
image; python_speech_features/librosa themselves are absent).

Receipts (measured 2026-08-21, written into docs/conventions.md):
- HTK mel filterbank: **bit-identical (max diff 0.0)** to
  mel_filter_bank(..., mel_scale="htk", triangularize_in_mel_space=True)
  — two independent codebases produce the same float64 constants.
- Slaney filterbank: matches the librosa-style Hz-space triangles
  (triangularize_in_mel_space=False, norm="slaney") to 1.3e-4 max —
  the documented convention delta (this oracle evaluates triangles in
  mel space for both scales; filters wholly inside Slaney's linear
  region coincide to float64, filters touching the 1 kHz knee or the
  log region interpolate in a different domain).
- Full chain (framing + symmetric hamming + 512-pt rFFT power + mel +
  floored log, pre-emphasis off): agrees to ~1e-7 in float64.
- Pre-emphasis is excluded from the chain receipt by design: HF/Kaldi
  pre-emphasize per frame, this framework per signal (documented
  deviation, docs/conventions.md pre-emphasis section).
"""

import numpy as np
import pytest

from mfcc_tpu import FeatureConfig, oracle

au = pytest.importorskip("transformers.audio_utils")


def test_htk_mel_filterbank_bit_identical():
    """The flagship receipt: HTK-scale mel filterbank constants equal
    transformers' mel-space triangles EXACTLY (diff 0.0)."""
    cfg = FeatureConfig()
    ours = oracle.mel_filterbank(cfg)              # (26, 257)
    hf = au.mel_filter_bank(
        num_frequency_bins=cfg.n_bins, num_mel_filters=cfg.n_mels,
        min_frequency=cfg.fmin, max_frequency=cfg.fmax_hz,
        sampling_rate=cfg.sample_rate, norm=None, mel_scale="htk",
        triangularize_in_mel_space=True).T
    assert np.abs(ours - hf).max() == 0.0


def test_htk_mel_filterbank_80_bands_bit_identical():
    """Same at the log-mel-80 production shape."""
    cfg = FeatureConfig(n_mels=80, n_mfcc=80)
    ours = oracle.mel_filterbank(cfg)
    hf = au.mel_filter_bank(
        num_frequency_bins=cfg.n_bins, num_mel_filters=80,
        min_frequency=0.0, max_frequency=cfg.fmax_hz,
        sampling_rate=cfg.sample_rate, norm=None, mel_scale="htk",
        triangularize_in_mel_space=True).T
    assert np.abs(ours - hf).max() == 0.0


def test_slaney_filterbank_matches_librosa_convention():
    """Slaney scale + area norm vs the librosa-style Hz-space triangles:
    1.3e-4 max — the mel-space-vs-Hz-space interpolation delta in the
    log region (documented; exact coincidence below 1 kHz where Slaney
    mel is linear in Hz)."""
    cfg = FeatureConfig(mel_scale="slaney")
    ours = oracle.mel_filterbank(cfg)
    hf = au.mel_filter_bank(
        num_frequency_bins=cfg.n_bins, num_mel_filters=cfg.n_mels,
        min_frequency=0.0, max_frequency=cfg.fmax_hz,
        sampling_rate=cfg.sample_rate, norm="slaney", mel_scale="slaney",
        triangularize_in_mel_space=False).T
    assert np.abs(ours - hf).max() < 2e-4
    # filters wholly inside the linear region (< 1 kHz knee): the two
    # interpolation domains coincide to float64 (a filter that straddles
    # the knee interpolates across the kink, where the domains differ)
    edges_hz = oracle.mel_to_hz(np.linspace(
        oracle.hz_to_mel(0.0, "slaney"),
        oracle.hz_to_mel(cfg.fmax_hz, "slaney"), cfg.n_mels + 2), "slaney")
    whole_linear = edges_hz[2:] < 1000.0           # per-filter upper edge
    assert whole_linear.sum() >= 4                 # claim is non-vacuous
    assert np.abs((ours - hf)[whole_linear]).max() < 1e-12


def test_mel_scale_formulas_match():
    """hz<->mel point conversions agree with transformers' (float64)."""
    f = np.linspace(0.0, 8000.0, 997)
    for scale in ("htk", "slaney"):
        np.testing.assert_allclose(
            oracle.hz_to_mel(f, scale), au.hertz_to_mel(f, scale),
            rtol=1e-12, atol=1e-12)
        m = oracle.hz_to_mel(f, scale)
        np.testing.assert_allclose(
            oracle.mel_to_hz(m, scale), au.mel_to_hertz(m, scale),
            rtol=1e-12, atol=1e-9)


def test_full_chain_log_mel_matches_transformers():
    """frame (valid) + symmetric hamming + 512-pt rFFT |X|^2 + HTK mel +
    log(max(., 1e-10)), pre-emphasis off: two independent float64 chains
    agree to ~1e-7 (FFT summation order)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(16000) * 0.3
    cfg = FeatureConfig(preemph=0.0, n_mels=26, n_mfcc=26)
    want = oracle.log_mel(x, cfg)                  # (T, 26)
    hf = au.spectrogram(
        x, np.hamming(cfg.frame_len), frame_length=cfg.frame_len,
        hop_length=cfg.hop_len, fft_length=cfg.n_fft, power=2.0,
        center=False, preemphasis=None,
        mel_filters=au.mel_filter_bank(
            num_frequency_bins=cfg.n_bins, num_mel_filters=cfg.n_mels,
            min_frequency=0.0, max_frequency=cfg.fmax_hz,
            sampling_rate=cfg.sample_rate, norm=None, mel_scale="htk",
            triangularize_in_mel_space=True),
        mel_floor=cfg.log_floor, log_mel="log", dtype=np.float64).T
    assert hf.shape == want.shape     # same valid-framing frame count
    assert np.abs(hf - want).max() < 1e-6


def test_window_matches_transformers():
    """Symmetric hamming/hann windows equal transformers'
    window_function(..., periodic=False) (and np.hamming/np.hanning)."""
    for name in ("hamming", "hann"):
        ours = oracle.window_fn(name, 400)
        hf = au.window_function(400, name, periodic=False)
        np.testing.assert_allclose(ours, hf, rtol=0, atol=1e-15)
