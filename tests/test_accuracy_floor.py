"""Error-model tests pinning the unbounded-range log-mel accuracy floor
(VERDICT r1 #6 — turn the 'see git history' claim into committed proof).

Claim (docs/conventions.md): the log of near-cancelled spectral valleys
is not resolvable to 1e-4 in ANY float32 pipeline, because the valley
power comes from catastrophic cancellation in the DFT sums: f32 rounding
inside re/im gives an absolute power error ~ eps * P_peak, i.e. a LOG
error ~ eps * P_peak / P_valley that exceeds 1e-4 whenever the valley
sits >= ~73 dB below the peak — independent of algorithm.

These tests prove it constructively on the CPU: a reference-grade f32
NumPy implementation (plain rfft, nothing shared with the JAX pipeline)
exceeds the tolerance on the same adversarial signal by a similar margin
as the pipeline, while the bounded-range contract (dynamic_range_db) and
the MFCC-13 headline contract both hold.  If hardware or XLA ever
regress beyond the f32 floor, the ratio test here catches it.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mfcc_tpu import FeatureConfig, oracle
from mfcc_tpu.models import logmel as logmel_model, mfcc as mfcc_model

# deterministic adversarial signal: two tones; mel bands far from both
# carry only window-leakage energy ~100+ dB below the peak bands
SR = 16000


def _two_tone(n=SR):
    t = np.arange(n) / SR
    x = 0.5 * np.sin(2 * np.pi * 180.0 * t) + 0.3 * np.sin(
        2 * np.pi * 1200.0 * t)
    return x.astype(np.float32)


def _f32_reference_logmel(x32: np.ndarray, cfg: FeatureConfig) -> np.ndarray:
    """Strict-f32 NumPy log-mel sharing NO code with the pipeline: f32
    framing/window, complex64 rfft, f32 mel GEMM, f32 log."""
    fl, hop = cfg.frame_len, cfg.hop_len
    T = cfg.num_frames(len(x32))
    prev = np.concatenate([x32[:1], x32[:-1]]).astype(np.float32)
    y = (x32 - np.float32(cfg.preemph) * prev).astype(np.float32)
    frames = np.stack([y[t * hop: t * hop + fl] for t in range(T)])
    w = oracle.window_fn(cfg.window, fl).astype(np.float32)
    spec = np.fft.rfft((frames * w).astype(np.float32), n=cfg.n_fft, axis=-1)
    spec = spec.astype(np.complex64)
    p = (spec.real.astype(np.float32) ** 2
         + spec.imag.astype(np.float32) ** 2)
    fb = oracle.mel_filterbank(cfg).astype(np.float32)
    e = (p @ fb.T).astype(np.float32)
    return np.log(np.maximum(e, np.float32(cfg.log_floor)))


def test_unbounded_valley_floor_is_f32_not_pipeline():
    # hann: sidelobes roll off fast enough that valleys reach ~124 dB
    # below peak — deep enough to expose the f32 floor (hamming's -60 dB
    # leakage floor would mask it).  Measured here: f32 rfft reference
    # 4.2e-3, pipeline 1.1e-2 — same failure, same order.
    cfg = FeatureConfig(n_mels=80, n_mfcc=80, window="hann").validate()
    x = _two_tone()
    want = oracle.log_mel(x.astype(np.float64), cfg)

    ref32 = _f32_reference_logmel(x, cfg)
    err_ref32 = np.abs(ref32 - want).max()

    got, flens, _ = logmel_model.log_mel_batch_jit(
        jnp.asarray(x[None]), jnp.asarray(np.array([len(x)], np.int32)), cfg)
    err_pipe = np.abs(np.asarray(got[0])[: want.shape[0]] - want).max()

    # 1. the independent f32 reference ITSELF violates the 1e-4 contract:
    #    the floor belongs to float32, not to this framework
    assert err_ref32 > 1e-4, err_ref32
    # 2. the pipeline sits at the same floor (within one order), not above
    assert err_pipe < 10.0 * err_ref32, (err_pipe, err_ref32)
    # 3. both errors live where the model says: valleys far below peak
    frame = np.abs(ref32 - want).max(axis=1).argmax()
    band = np.abs(ref32[frame] - want[frame]).argmax()
    depth_db = 10.0 * (want[frame].max() - want[frame][band]) / np.log(10.0)
    assert depth_db > 60.0, depth_db  # it IS a deep valley


@pytest.mark.parametrize("db, bound", [
    (50.0, 1e-4),   # THE contract point (measured 1.8e-5 / 4.4e-5)
    (60.0, 2.5e-4),  # f32 model bound 2*eps*10^3 (measured 3.5e-5/1.21e-4)
    (80.0, 5e-4),   # measured 1.7e-4 CPU / 2.5e-4 TPU (signal-dependent:
                    # the model bound 2*eps*10^4 binds only if valleys
                    # actually sit at the floor)
])
@pytest.mark.parametrize("signal", ["adversarial", "speechlike"])
def test_bounded_range_error_scales_with_floor(db, bound, signal,
                                               speechlike):
    """THE log-mel accuracy contract (docs/conventions.md accuracy
    policy): log-mel-80 holds 1e-4 vs the float64 oracle at a declared
    dynamic_range_db <= 50 window — on the adversarial two-tone signal
    (whose unbounded valleys fail any f32 pipeline, test above) AND on
    speech-like audio.  With the Kaldi-style per-frame floor the log
    only has to resolve energies the floor keeps, so the error scales
    with the window depth as ~2*eps*10^(db/20): 7.6e-5 at 50 dB,
    2.4e-4 at 60 (the speech-like signal measures 1.21e-4 there — which
    is why the strict contract point is 50, not the 60 the adversarial
    signal alone would suggest)."""
    cfg = FeatureConfig(n_mels=80, n_mfcc=80, window="hann",
                        dynamic_range_db=db).validate()
    x = _two_tone() if signal == "adversarial" else speechlike
    want = oracle.log_mel(x.astype(np.float64), cfg)
    got, flens, _ = logmel_model.log_mel_batch_jit(
        jnp.asarray(x[None]), jnp.asarray(np.array([len(x)], np.int32)), cfg)
    err = np.abs(np.asarray(got[0])[: want.shape[0]] - want).max()
    assert err < bound, (db, signal, err)


def test_mfcc13_headline_contract_on_adversarial_signal():
    """The DCT integrates over bands, so the headline MFCC-13 contract
    holds even on the adversarial two-tone signal, unbounded range."""
    cfg = FeatureConfig()
    x = _two_tone()
    want = oracle.mfcc(x.astype(np.float64), cfg)
    got = np.asarray(mfcc_model.mfcc_jit(jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, want, atol=1e-4)
