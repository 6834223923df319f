"""Polyphase resampler: scipy cross-check, jax parity, runner policy.

The float64 twin (resample_poly_numpy) is designed to be bit-comparable
to scipy.signal.resample_poly's default Kaiser design — an independent
trusted implementation, the same differential pattern as the MFCC oracle
(SURVEY.md §4).  The jax GEMM path is then pinned to the twin at f32
roundoff.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from mfcc_tpu import FeatureConfig, oracle
from mfcc_tpu.ops import resample as rs
from mfcc_tpu.utils import wav

RATES = [(48000, 16000), (44100, 16000), (22050, 16000), (32000, 16000),
         (8000, 16000), (11025, 16000), (16000, 8000)]


@pytest.mark.parametrize("sr_in, sr_out", RATES)
def test_numpy_twin_matches_scipy(rng, sr_in, sr_out):
    scipy_signal = pytest.importorskip("scipy.signal")
    x = rng.standard_normal(12_345)
    L, M = rs.reduce_ratio(sr_in, sr_out)
    mine = rs.resample_poly_numpy(x, sr_in, sr_out)
    ref = scipy_signal.resample_poly(x, L, M)
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=1e-12)


@pytest.mark.parametrize("sr_in, sr_out", RATES)
@pytest.mark.parametrize("n", [12_345, 160, 7])
def test_jax_matches_numpy_twin(rng, sr_in, sr_out, n):
    x = rng.standard_normal(n).astype(np.float32)
    want = rs.resample_poly_numpy(x, sr_in, sr_out)
    got = np.asarray(rs.resample_jit(jnp.asarray(x), sr_in, sr_out))
    assert got.shape == want.shape
    assert got.shape[-1] == rs.resampled_length(n, sr_in, sr_out)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_batched_matches_single(rng):
    x = rng.standard_normal((3, 16_000)).astype(np.float32)
    got = np.asarray(rs.resample_jit(jnp.asarray(x), 48_000, 16_000))
    for i in range(3):
        np.testing.assert_allclose(
            got[i], rs.resample_poly_numpy(x[i], 48_000, 16_000), atol=1e-5)


def test_identity_and_empty(rng):
    x = jnp.asarray(rng.standard_normal(100).astype(np.float32))
    assert rs.resample(x, 16_000, 16_000) is x
    assert rs.resample(x[:0], 48_000, 16_000).shape == (0,)


def test_tone_survives_resampling(rng):
    """A 1 kHz tone at 48 kHz must come out as a 1 kHz tone at 16 kHz
    (amplitude preserved within the filter's passband ripple)."""
    sr_in, sr_out, f = 48_000, 16_000, 1000.0
    t = np.arange(sr_in, dtype=np.float64) / sr_in
    x = np.sin(2 * np.pi * f * t)
    y = rs.resample_poly_numpy(x, sr_in, sr_out)
    t2 = np.arange(len(y), dtype=np.float64) / sr_out
    want = np.sin(2 * np.pi * f * t2)
    core = slice(100, len(y) - 100)  # ignore zero-padded edges
    assert np.abs(y[core] - want[core]).max() < 1e-3


def test_antialiasing(rng):
    """Content above the output Nyquist must be attenuated, not folded:
    a 7 kHz tone at 48 kHz -> 16 kHz (Nyquist 8 kHz) survives; an 11 kHz
    tone (past the Kaiser transition band of the 61-tap filter) must come
    out ~silent instead of aliasing to 5 kHz."""
    sr_in, sr_out = 48_000, 16_000
    t = np.arange(sr_in, dtype=np.float64) / sr_in
    keep = rs.resample_poly_numpy(np.sin(2 * np.pi * 7000 * t), sr_in, sr_out)
    kill = rs.resample_poly_numpy(np.sin(2 * np.pi * 11000 * t), sr_in, sr_out)
    core = slice(200, -200)
    assert np.abs(keep[core]).max() > 0.9
    assert np.abs(kill[core]).max() < 0.02


def test_runner_resamples_foreign_rate(tmp_path, rng):
    """Mixed-rate corpus: with resample on, the 48 kHz file is converted
    (features match the oracle on the resampled waveform); with it off,
    the file is quarantined."""
    from mfcc_tpu import runner

    cfg = FeatureConfig().validate()
    x16 = (0.3 * rng.standard_normal(16_000)).astype(np.float32)
    x48 = (0.3 * rng.standard_normal(48_000)).astype(np.float32)
    wav.write_wav(tmp_path / "a16k.wav", x16, 16_000)
    wav.write_wav(tmp_path / "b48k.wav", x48, 48_000)

    out = tmp_path / "feats"
    rep = runner.run(str(tmp_path), cfg, runner.RunnerOptions(
        out_dir=str(out), batch_size=4, resample=True))
    assert rep.n_utterances == 2
    assert rep.max_abs_error is not None and rep.max_abs_error < 1e-4

    # b48k's features == oracle on the exact ingestion waveform
    got = np.load(out / "b48k.npy")
    # reproduce ingestion: PCM16 decode -> f64 resample -> f32
    xq, sr = wav.read_wav(tmp_path / "b48k.wav")
    assert sr == 48_000
    y = rs.resample_poly_numpy(xq, 48_000, 16_000).astype(np.float32)
    want = oracle.mfcc(y.astype(np.float64), cfg)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)

    # policy off: foreign-rate file quarantined, native-rate processed
    out2 = tmp_path / "feats_noresample"
    rep2 = runner.run(str(tmp_path), cfg, runner.RunnerOptions(
        out_dir=str(out2), batch_size=4, resample=False))
    assert rep2.n_utterances == 1
    assert (out2 / "a16k.npy").exists()
    assert not (out2 / "b48k.npy").exists()


def test_streaming_resampler_matches_batch(rng):
    """StreamingResampler chunk concatenation == resample_poly_numpy to
    f64 roundoff, for down/up/rational ratios and odd chunk sizes."""
    from mfcc_tpu.ops.resample import StreamingResampler, resample_poly_numpy
    for sr_in, sr_out, n in [(16000, 4000, 32000), (16000, 2000, 16013),
                             (44100, 16000, 20000), (8000, 16000, 8005)]:
        x = rng.standard_normal(n)
        want = resample_poly_numpy(x, sr_in, sr_out)
        for chunk in (160, 1001, 7):
            sr = StreamingResampler(sr_in, sr_out)
            outs, i = [], 0
            while i < n:
                outs.append(sr.feed(x[i: i + chunk]))
                i += chunk
            outs.append(sr.flush())
            got = np.concatenate(outs)
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, atol=1e-13)


def test_streaming_resampler_rejects_noop():
    from mfcc_tpu.ops.resample import StreamingResampler
    import pytest
    with pytest.raises(ValueError):
        StreamingResampler(16000, 16000)
