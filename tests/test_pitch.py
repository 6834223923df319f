"""Pitch tracker: float64-oracle parity, f0 ground-truth accuracy,
ragged-batch/padding invariance, and config validation.

Accuracy contract (docs/conventions.md): pov and delta columns 1e-4 vs
the oracle; the normalized-log-pitch column 3e-4 (the POV^2-weighted
sliding mean amplifies the ~1e-5 NCCF roundoff by the window's
value spread; measured 1.2e-4 worst case on the fixtures).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mfcc_tpu.config import PitchConfig
from mfcc_tpu import oracle
from mfcc_tpu.models import pitch as pitch_model
from mfcc_tpu.ops import pitch as pitch_op

PCFG = PitchConfig().validate()
SR = 16000

ATOL = {"pov": 1e-4, "norm": 3e-4, "delta": 1e-4}


def _tone_silence(rng):
    t = np.arange(SR) / SR
    voiced = (0.4 * np.sin(2 * np.pi * 220 * t)
              + 0.2 * np.sin(2 * np.pi * 440 * t)
              + 0.01 * rng.standard_normal(SR))
    sil = 0.001 * rng.standard_normal(SR)
    return np.concatenate([voiced, sil]).astype(np.float32)


def _vibrato(rng, n=SR, f0=180.0, depth=0.1, rate=4.0):
    t = np.arange(n) / SR
    phase = 2 * np.pi * f0 * (t + depth / (2 * np.pi * rate)
                              * np.sin(2 * np.pi * rate * t))
    x = np.zeros(n)
    for h, a in ((1, 0.5), (2, 0.25), (3, 0.12)):
        x += a * np.sin(h * phase)
    return (x + 0.02 * rng.standard_normal(n)).astype(np.float32)


def _check_vs_oracle(x, pcfg=PCFG):
    want = oracle.pitch(x.astype(np.float64), pcfg)
    got = np.asarray(pitch_model.pitch_jit(jnp.asarray(x), pcfg))
    assert got.shape == want.shape
    for i, nm in enumerate(("pov", "norm", "delta")):
        err = float(np.abs(got[:, i] - want[:, i]).max())
        assert err < ATOL[nm], (nm, err)


def test_oracle_parity_tone_silence(rng):
    _check_vs_oracle(_tone_silence(rng))


def test_nccf_chunked_matches_unchunked(rng):
    """Chunked NCCF (the B=1 long-form lane-fill lever, VERDICT r4 #2):
    folding K-frame time chunks into the batch axis reproduces the
    unchunked NCCF bit-for-bit on the plain normalization (identical
    per-frame samples + reductions) and to ballast-mean roundoff on the
    ballasted one; the full feature pipeline with nccf_chunk +
    viterbi_block stays inside the oracle contract."""
    x = np.concatenate([_vibrato(rng, n=3 * SR),
                        _tone_silence(rng)])[None, :]
    lens = jnp.asarray([x.shape[1]], jnp.int32)
    T = PCFG.num_frames(x.shape[1])
    from mfcc_tpu.ops.resample import resample
    xw = resample(jnp.asarray(x), PCFG.sample_rate, PCFG.work_rate)
    mask = jnp.ones((1, T), bool)
    import jax
    hi = jax.lax.Precision.HIGHEST
    want_b, want_p = pitch_op.nccf(xw, PCFG, mask, precision=hi)
    got_b, got_p = pitch_op._nccf_chunked(xw, PCFG, mask, 128,
                                          precision=hi, backend="xla")
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               atol=2e-6)
    # full pipeline on a fully-VOICED signal: nccf_chunk stays inside
    # the oracle contract (on long silence the lag is weakly determined
    # and the chunked path's wrapper-convention ballast — a summation-
    # order difference of ~2e-6 — can flip near-tie silence lags, the
    # same deviation class the blocked Viterbi documents)
    xv = _vibrato(rng, n=4 * SR)[None, :]
    lv = jnp.asarray([xv.shape[1]], jnp.int32)
    want = oracle.pitch(xv[0].astype(np.float64), PCFG)
    feat, flens, m = pitch_op.pitch_features(
        jnp.asarray(xv), lv, PCFG, nccf_chunk=128)
    got = np.asarray(feat)[0, : int(flens[0])]
    for i, nm in enumerate(("pov", "norm", "delta")):
        err = float(np.abs(got[:, i] - want[:, i]).max())
        assert err < ATOL[nm], (nm, err)
    # and with BOTH long-form levers on the voiced signal, equals the
    # unchunked blocked pipeline
    f2, _, _ = pitch_op.pitch_features(
        jnp.asarray(xv), lv, PCFG, viterbi_block=256, viterbi_warm=128,
        nccf_chunk=128)
    f3, _, _ = pitch_op.pitch_features(
        jnp.asarray(xv), lv, PCFG, viterbi_block=256, viterbi_warm=128)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f3), atol=3e-4)


# ------------------------------------------------- fused NCCF kernel --

@pytest.mark.parametrize("pcfg", [
    PCFG,
    PitchConfig(work_rate=2000).validate(),     # hop 20 -> P=32 (r4)
    PitchConfig(min_f0=60.0, max_f0=300.0).validate(),
])
def test_fused_nccf_matches_xla(rng, pcfg):
    """The Pallas NCCF kernel (interpret mode) must match ops/pitch.nccf
    on the valid region — same correlation-theorem math, VMEM-resident
    spectra (kernels/fused_nccf docstring)."""
    from mfcc_tpu.ops.kernels import fused_nccf
    if not fused_nccf.nccf_kernel_eligible(pcfg):
        pytest.skip("config not NCCF-kernel eligible")
    from mfcc_tpu.ops.resample import resample
    x = _vibrato(rng, n=2 * SR)[None, :]
    xw = np.asarray(resample(jnp.asarray(x), pcfg.sample_rate,
                             pcfg.work_rate))
    T = pcfg.num_frames(x.shape[1])
    flens = pitch_op.pitch_frame_counts(
        jnp.asarray([x.shape[1]], jnp.int32), pcfg)
    mask = jnp.arange(T)[None, :] < jnp.minimum(flens, T)[:, None]
    want_b, want_p = pitch_op.nccf(jnp.asarray(xw), pcfg, mask)
    mean_e = pitch_op.mean_frame_energy(jnp.asarray(xw), pcfg, mask)
    ball = pcfg.ballast * mean_e * mean_e
    got_b, got_p = fused_nccf.fused_nccf(
        jnp.asarray(xw), ball, pcfg, T=T, interpret=True)
    v = int(flens[0])
    np.testing.assert_allclose(np.asarray(got_b)[0, :v],
                               np.asarray(want_b)[0, :v], atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_p)[0, :v],
                               np.asarray(want_p)[0, :v], atol=2e-5)


def test_fused_nccf_multi_tile_and_batch(rng):
    """Tile boundaries (tile_t < T forces >1 grid step) and batch rows
    must be seamless."""
    from mfcc_tpu.ops.kernels import fused_nccf
    from mfcc_tpu.ops.resample import resample
    pcfg = PCFG
    second = np.pad(_tone_silence(rng), (0, SR))[: 3 * SR]
    x = np.stack([_vibrato(rng, n=3 * SR), second]).astype(np.float32)
    xw = np.asarray(resample(jnp.asarray(x), pcfg.sample_rate,
                             pcfg.work_rate))
    T = pcfg.num_frames(x.shape[1])
    lens = jnp.asarray([3 * SR, 2 * SR], jnp.int32)
    flens = jnp.minimum(pitch_op.pitch_frame_counts(lens, pcfg), T)
    mask = jnp.arange(T)[None, :] < flens[:, None]
    want_b, _ = pitch_op.nccf(jnp.asarray(xw), pcfg, mask)
    mean_e = pitch_op.mean_frame_energy(jnp.asarray(xw), pcfg, mask)
    ball = pcfg.ballast * mean_e * mean_e
    P = 128 // np.gcd(pcfg.hop_len_w, 128)
    got_b, _ = fused_nccf.fused_nccf(
        jnp.asarray(xw), ball, pcfg, T=T, tile_t=8 * int(P),
        interpret=True)
    for i in range(2):
        v = int(flens[i])
        np.testing.assert_allclose(np.asarray(got_b)[i, :v],
                                   np.asarray(want_b)[i, :v], atol=2e-5)


def test_fused_viterbi_bit_identical(rng):
    """The Pallas forward+backtrace must produce BIT-IDENTICAL paths to
    the XLA scan (f32 min is exact; strict-< running argmin preserves
    first-minimal-index semantics — kernels/fused_viterbi docstring)."""
    from mfcc_tpu.ops.kernels import fused_viterbi
    B, T, n = 3, 150, PCFG.n_lags        # T crosses two TB=64 blocks + tail
    scores = jnp.asarray(
        0.5 * rng.standard_normal((B, T, n)).astype(np.float32))
    # zero-emission tail rows, as the masked pipeline produces
    scores = scores.at[1, 100:].set(0.0)
    want = np.asarray(pitch_op.viterbi(scores, PCFG))
    got = np.asarray(fused_viterbi.viterbi_pallas(scores, PCFG,
                                                  interpret=True))
    assert got.dtype == want.dtype and got.shape == want.shape
    assert (got == want).all()


def test_fused_viterbi_short_and_single_step(rng):
    from mfcc_tpu.ops.kernels import fused_viterbi
    for T in (1, 2, 64, 65):
        scores = jnp.asarray(
            0.5 * rng.standard_normal((2, T, PCFG.n_lags))
            .astype(np.float32))
        want = np.asarray(pitch_op.viterbi(scores, PCFG))
        got = np.asarray(fused_viterbi.viterbi_pallas(scores, PCFG,
                                                      interpret=True))
        assert (got == want).all(), T


def test_pitch_pallas_ineligible_config_falls_back(rng):
    """r4 review finding: explicit backend='pallas' on an NCCF-kernel-
    ineligible config (hop_len_w 61 -> 128 lane phases, past the 32-cap)
    must run the XLA path like every other model's dispatch, not raise."""
    pcfg = PitchConfig(hop_ms=15.25).validate()
    from mfcc_tpu.ops.kernels import fused_nccf
    assert not fused_nccf.nccf_kernel_eligible(pcfg)
    x = _tone_silence(rng)[: SR]
    feat, flens, _ = pitch_model.pitch_batch_jit(
        jnp.asarray(x)[None, :], jnp.asarray([x.shape[0]], jnp.int32),
        pcfg, "pallas")
    ref, _, _ = pitch_model.pitch_batch_jit(
        jnp.asarray(x)[None, :], jnp.asarray([x.shape[0]], jnp.int32),
        pcfg, "xla")
    np.testing.assert_array_equal(np.asarray(feat), np.asarray(ref))


def test_viterbi_blocked_short_input_honors_pallas_backend(rng):
    """r4 review finding: the short-T early return in viterbi_blocked
    used to drop back to the plain scan even under backend='pallas'."""
    scores = jnp.asarray(
        0.5 * rng.standard_normal((2, 100, PCFG.n_lags)).astype(np.float32))
    want = np.asarray(pitch_op.viterbi(scores, PCFG))
    got = np.asarray(pitch_op.viterbi_blocked(scores, PCFG, block=256,
                                              warm=128, backend="pallas"))
    assert (got == want).all()


def test_viterbi_blocked_pallas_bit_identical(rng):
    """viterbi_blocked(backend='pallas') folds the chunk axis into the
    kernel's batch lanes; each chunk's solution is bit-identical to the
    XLA blocked path."""
    scores = jnp.asarray(
        0.5 * rng.standard_normal((1, 900, PCFG.n_lags)).astype(np.float32))
    want = np.asarray(pitch_op.viterbi_blocked(scores, PCFG, block=256,
                                               warm=128))
    got = np.asarray(pitch_op.viterbi_blocked(scores, PCFG, block=256,
                                              warm=128, backend="pallas"))
    assert (got == want).all()


def test_pitch_pallas_backend_matches_oracle(rng):
    """backend='pallas' end-to-end pitch features (kernel NCCF +
    everything downstream) vs the float64 oracle, same contract as the
    XLA path."""
    x = _tone_silence(rng)
    pcfg = PCFG
    want = oracle.pitch(x.astype(np.float64), pcfg)
    feat, flens, _ = pitch_model.pitch_batch_jit(
        jnp.asarray(x)[None, :], jnp.asarray([x.shape[0]], jnp.int32),
        pcfg, "pallas")
    got = np.asarray(feat[0])[: int(flens[0])]
    assert got.shape == want.shape
    for i, nm in enumerate(("pov", "norm", "delta")):
        err = float(np.abs(got[:, i] - want[:, i]).max())
        assert err < ATOL[nm], (nm, err)


def test_oracle_parity_vibrato(rng):
    _check_vs_oracle(_vibrato(rng))


def test_oracle_parity_noise_only(rng):
    _check_vs_oracle((0.1 * rng.standard_normal(SR)).astype(np.float32))


def test_oracle_parity_work_rate_2000(rng):
    """work_rate=2000 reproduces Kaldi's 1 kHz lowpass exactly (the
    resampler's anti-alias cutoff IS the pitch lowpass)."""
    pcfg = PitchConfig(work_rate=2000).validate()
    _check_vs_oracle(_tone_silence(rng), pcfg)


def test_viterbi_path_matches_oracle(rng):
    """Integer lag path identical to the float64 Viterbi (no near-ties
    on generic signals; f32 NCCF roundoff is ~1e-6)."""
    x = _vibrato(rng)
    from mfcc_tpu.ops.resample import resample_poly_numpy
    xw = resample_poly_numpy(x.astype(np.float64), SR, PCFG.work_rate)
    nb, _ = oracle.nccf(xw, PCFG)
    want = oracle.pitch_viterbi(nb, PCFG)
    T = PCFG.num_frames(x.size)
    mask = jnp.ones((1, T), bool)
    xw_j = pitch_op.resample(jnp.asarray(x)[None], SR, PCFG.work_rate)
    nb_j, _ = pitch_op.nccf(xw_j, PCFG, mask)
    got = np.asarray(pitch_op.viterbi(nb_j, PCFG))[0]
    assert (got == want).all()


def test_viterbi_blocked_deviation_confined_to_silence(rng):
    """Blocked Viterbi (opt-in execution strategy, VERDICT r2 #9) must
    agree with the exact path on every frame that carries ANY voicing
    evidence; deviations may only occur on zero-evidence frames (masked
    ballasted NCCF ~ 0), where the lag track is undetermined and every
    path is near-equal cost.  This is the documented contract of
    `viterbi_blocked` (measured: path cost within 0.03% of exact)."""
    voiced = _vibrato(rng, n=2 * SR)
    sil = (0.001 * rng.standard_normal(SR)).astype(np.float32)
    x = np.concatenate([voiced, sil, _vibrato(rng, n=SR, f0=120.0), sil])
    T = PCFG.num_frames(x.size)
    mask = jnp.ones((1, T), bool)
    xw = pitch_op.resample(jnp.asarray(x)[None], SR, PCFG.work_rate)
    nb, _ = pitch_op.nccf(xw, PCFG, mask)
    exact = np.asarray(pitch_op.viterbi(nb, PCFG))[0]
    blocked = np.asarray(pitch_op.viterbi_blocked(
        nb, PCFG, block=128, warm=64))[0]
    vmax = np.asarray(nb)[0].max(axis=-1)        # voicing evidence
    diff = blocked != exact
    # no deviation anywhere there is voicing evidence
    assert not (diff & (vmax > 0.01)).any(), \
        (int(diff.sum()), float(vmax[diff].max()) if diff.any() else 0.0)
    # and the voiced region is genuinely exercised (most frames voiced)
    assert (vmax > 0.5).sum() > T // 2


def test_viterbi_blocked_short_input_falls_back(rng):
    """T <= block + 2*warm routes to the exact path (identical output)."""
    x = _vibrato(rng, n=SR)
    T = PCFG.num_frames(x.size)
    mask = jnp.ones((1, T), bool)
    xw = pitch_op.resample(jnp.asarray(x)[None], SR, PCFG.work_rate)
    nb, _ = pitch_op.nccf(xw, PCFG, mask)
    exact = np.asarray(pitch_op.viterbi(nb, PCFG))
    blocked = np.asarray(pitch_op.viterbi_blocked(
        nb, PCFG, block=256, warm=128))
    assert (blocked == exact).all()


def test_f0_ground_truth(rng):
    """Recovered f0 within 2% of the true (time-varying) f0 on voiced
    frames of a vibrato harmonic tone."""
    f0, rate, depth = 180.0, 4.0, 0.1
    x = _vibrato(rng, f0=f0, rate=rate, depth=depth)
    got_f0, voicing, mask = pitch_model.pitch_track_batch_jit(
        jnp.asarray(x)[None], jnp.asarray([x.size], jnp.int32), PCFG)
    got_f0 = np.asarray(got_f0)[0]
    T = got_f0.shape[0]
    # instantaneous f0 at frame centers
    tc = (np.arange(T) * PCFG.hop_len_w + (PCFG.frame_len_w / 2)) \
        / PCFG.work_rate
    true_f0 = f0 * (1 + depth * np.cos(2 * np.pi * rate * tc))
    rel = np.abs(got_f0 - true_f0) / true_f0
    assert np.median(rel) < 0.01
    assert np.percentile(rel, 95) < 0.02
    assert float(np.asarray(voicing)[0].mean()) > 0.7


def test_voicing_separates_silence(rng):
    x = _tone_silence(rng)
    feat = np.asarray(pitch_model.pitch_jit(jnp.asarray(x), PCFG))
    T = feat.shape[0]
    # pov_feature ~ -1.1 voiced, ~0 unvoiced (Kaldi nonlinearity)
    assert feat[10: T // 2 - 10, 0].mean() < -0.8
    assert feat[T // 2 + 10: T - 10, 0].mean() > -0.15


def test_batch_matches_single(rng):
    """Zero-padded ragged batch == per-utterance runs on the valid
    region; padded frames zero."""
    a = _tone_silence(rng)                 # 2 s
    b = _vibrato(rng, n=12000)             # 0.75 s
    N = a.size
    xb = np.zeros((2, N), np.float32)
    xb[0], xb[1, : b.size] = a, b
    lens = np.asarray([a.size, b.size], np.int32)
    feat, flens, mask = pitch_model.pitch_batch_jit(
        jnp.asarray(xb), jnp.asarray(lens), PCFG)
    feat, flens, mask = map(np.asarray, (feat, flens, mask))
    assert flens[0] == PCFG.num_frames(a.size)
    assert flens[1] == PCFG.num_frames(b.size)
    fa = np.asarray(pitch_model.pitch_jit(jnp.asarray(a), PCFG))
    fb = np.asarray(pitch_model.pitch_jit(jnp.asarray(b), PCFG))
    np.testing.assert_allclose(feat[0, : flens[0]], fa, atol=2e-5)
    np.testing.assert_allclose(feat[1, : flens[1]], fb, atol=2e-5)
    assert (feat[1, flens[1]:] == 0).all()
    assert mask[1, flens[1]:].sum() == 0


def test_int16_input(rng):
    x = _tone_silence(rng)
    xi = (np.clip(x, -1, 1) * 32768.0).astype(np.int16)
    xf = xi.astype(np.float32) / 32768.0
    got_i, _, _ = pitch_model.pitch_batch_jit(
        jnp.asarray(xi)[None], jnp.asarray([x.size], jnp.int32), PCFG)
    got_f, _, _ = pitch_model.pitch_batch_jit(
        jnp.asarray(xf)[None], jnp.asarray([x.size], jnp.int32), PCFG)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(got_f),
                               atol=1e-6)


def test_short_signal_zero_frames():
    x = jnp.zeros((1, 500), jnp.float32)
    feat, flens, mask = pitch_model.pitch_batch_jit(
        x, jnp.asarray([500], jnp.int32), PCFG)
    assert feat.shape == (1, 0, 3)
    assert int(flens[0]) == 0


def test_align_pitch():
    fp = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
    flens = jnp.asarray([4, 2], jnp.int32)
    out = np.asarray(pitch_model.align_pitch(fp, flens, 6))
    assert out.shape == (2, 6, 3)
    np.testing.assert_array_equal(out[0, 4], out[0, 3])   # replicated
    np.testing.assert_array_equal(out[1, 2], out[1, 1])
    np.testing.assert_array_equal(out[1, 5], out[1, 1])
    # zero pitch frames -> zeros
    out0 = np.asarray(pitch_model.align_pitch(
        fp, jnp.asarray([0, 1], jnp.int32), 3))
    assert (out0[0] == 0).all()


def test_cli_pitch_append(tmp_path, rng):
    """--pitch end-to-end: CLI -> runner -> npy with 13+3 columns; the
    run report's oracle self-check covers the combined features."""
    import json
    from mfcc_tpu.utils import wav as wavio
    from mfcc_tpu import cli
    x = _tone_silence(rng)
    wavio.write_wav(str(tmp_path / "u.wav"), x, SR)
    out = tmp_path / "out"
    rc = cli.main([str(tmp_path / "u.wav"), "-o", str(out), "--pitch"])
    assert rc == 0
    feat = np.load(out / "u.npy")
    assert feat.shape[1] == 16
    rep = json.load(open(out / "run_report.0.json"))
    # main columns at the feature tolerance; pitch columns reported
    # separately at their own contract (ADVICE r4 column separation)
    assert rep["max_abs_error"] < 1e-4
    assert rep["max_abs_error_pitch"] < 3e-4
    # pitch columns match the aligned oracle (on the int16-quantized
    # audio the WAV round-trip actually stored)
    xq, _sr = wavio.read_wav(str(tmp_path / "u.wav"))
    want_p = oracle.pitch(xq.astype(np.float64), PCFG)
    T = feat.shape[0]
    idx = np.minimum(np.arange(T), want_p.shape[0] - 1)
    np.testing.assert_allclose(feat[:, 13:], want_p[idx], atol=3e-4)


def test_config_validation():
    with pytest.raises(ValueError):
        PitchConfig(work_rate=32000).validate()
    with pytest.raises(ValueError):
        PitchConfig(min_f0=500.0, max_f0=400.0).validate()
    with pytest.raises(ValueError):
        PitchConfig(max_f0=3000.0).validate()
    with pytest.raises(ValueError):
        PitchConfig(norm_window=150).validate()
    assert PitchConfig().validate().n_feats == 3
    assert PitchConfig().config_hash() != PitchConfig(
        penalty=0.2).config_hash()
