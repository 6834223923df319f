"""Online pitch tracker: f32-vs-f64 twin parity, feed-size invariance,
bounded latency, and agreement with the batch tracker where the
conventions coincide."""

import numpy as np
import pytest

from mfcc_tpu.config import PitchConfig
from mfcc_tpu import oracle
from mfcc_tpu.models import pitch_online
from mfcc_tpu.models.pitch_online import OnlinePitch, online_pitch_np

PCFG = PitchConfig().validate()
SR = 16000

ATOL = {"pov": 1e-4, "norm": 3e-4, "delta": 1e-4}


def _signal(rng, n=2 * SR):
    t = np.arange(n) / SR
    half = n // 2
    x = np.zeros(n)
    phase = 2 * np.pi * 200 * (t[:half]
                               + 0.02 * np.sin(2 * np.pi * 3 * t[:half]))
    x[:half] = 0.4 * np.sin(phase) + 0.2 * np.sin(2 * phase)
    x += 0.01 * rng.standard_normal(n)
    return x.astype(np.float32)


def _run_online(x, delay=50, chunk_frames=16, feed=4096):
    op = OnlinePitch(PCFG, delay=delay, chunk_frames=chunk_frames)
    rows, i = [], 0
    while i < x.size:
        rows.append(op.feed(x[i: i + feed]))
        i += feed
    rows.append(op.flush())
    return np.concatenate(rows)


def test_online_matches_float64_twin(rng):
    x = _signal(rng)
    got = _run_online(x)
    want = online_pitch_np(x.astype(np.float64), PCFG, delay=50,
                           chunk_frames=16)
    assert got.shape == want.shape == (PCFG.num_frames(x.size), 3)
    for i, nm in enumerate(("pov", "norm", "delta")):
        err = float(np.abs(got[:, i] - want[:, i]).max())
        assert err < ATOL[nm], (nm, err)


def test_feed_size_invariance(rng):
    """The emission schedule depends only on chunk_frames/delay — the
    caller's feed sizes change nothing (internal chunking is fixed)."""
    x = _signal(rng, n=SR)
    a = _run_online(x, feed=x.size)          # everything at once
    b = _run_online(x, feed=333)             # odd small feeds
    np.testing.assert_array_equal(a, b)


def test_bounded_latency(rng):
    """After feeding enough audio, rows lag by at most delay + one
    device chunk of frames."""
    x = _signal(rng)
    delay, F = 30, 16
    op = OnlinePitch(PCFG, delay=delay, chunk_frames=F)
    fed = 0
    out_rows = 0
    for i in range(0, x.size, 1600):          # 100 ms feeds
        out_rows += op.feed(x[i: i + 1600]).shape[0]
        fed += min(1600, x.size - i)
        scored_possible = PCFG.num_frames(fed)
        lag = scored_possible - out_rows
        assert lag <= delay + F + 2
    out_rows += op.flush().shape[0]
    assert out_rows == PCFG.num_frames(x.size)


def test_full_delay_path_equals_batch_viterbi(rng):
    """With delay >= T every decision comes from the true final cost;
    the remaining deviation vs the batch tracker is only the causal
    ballast, which on clearly-voiced frames leaves the integer path —
    and so the pov column — identical.  (On noise-only frames the
    ballast difference legitimately flips among near-tied lags, so only
    the voiced half is compared strictly.)"""
    import jax.numpy as jnp
    from mfcc_tpu.models import pitch as pitch_model
    x = _signal(rng, n=SR)
    T = PCFG.num_frames(x.size)
    got = _run_online(x, delay=T + 10)
    batch = np.asarray(pitch_model.pitch_jit(jnp.asarray(x), PCFG))
    voiced = slice(2, T // 2 - 4)
    d = np.abs(got[voiced, 0] - batch[voiced, 0])
    # near-tied lags may still flip (the ballast IS different); require
    # >= 95% of voiced frames on the identical integer lag
    assert (d < 2e-4).mean() >= 0.95, d.max()
    # both trackers call the voiced half voiced and the noise half not
    assert got[voiced, 0].mean() < -0.5
    assert got[T // 2 + 4: T - 2, 0].mean() > -0.2


def test_host_buffers_stay_bounded(rng):
    """Ring-buffer pruning: a long-lived stream must not grow host
    memory (review r2 finding)."""
    op = OnlinePitch(PCFG, delay=50, chunk_frames=16)
    for _ in range(20):                       # 20 s of audio
        op.feed((0.1 * rng.standard_normal(SR)).astype(np.float32))
    assert len(op._back) <= 50 + 16 + 4       # delay + one chunk
    assert len(op._nccf) == len(op._back)
    assert len(op._logf0) <= PCFG.norm_window + PCFG.delta_window + 16


def test_runner_pitch_config_derives_from_cfg():
    """--pitch must share the main pipeline's frame/hop (review r2:
    hard-coded 25/10 ms misaligned --hop-ms runs) and cap work_rate at
    the input rate (--sample-rate 2000 used to crash validate())."""
    from mfcc_tpu.runner import _pitch_config
    from mfcc_tpu import FeatureConfig
    cfg = FeatureConfig(hop_ms=20.0, frame_ms=30.0)
    p = _pitch_config(cfg)
    assert p.hop_ms == 20.0 and p.frame_ms == 30.0
    assert p.work_rate == 4000
    cfg2 = FeatureConfig(sample_rate=2000, n_fft=64, n_mels=8, n_mfcc=4)
    p2 = _pitch_config(cfg2)
    assert p2.work_rate == 2000 and p2.sample_rate == 2000


def test_short_and_empty_stream():
    op = OnlinePitch(PCFG)
    assert op.feed(np.zeros(100, np.float32)).shape == (0, 3)
    assert op.flush().shape == (0, 3)
    # shorter than one frame at the work rate
    op2 = OnlinePitch(PCFG)
    op2.feed(np.zeros(500, np.float32))
    assert op2.flush().shape == (0, 3)
    with pytest.raises(AssertionError):
        op2.feed(np.zeros(10, np.float32))    # feed after flush
