"""Feature post-processing (ops/post.py): float64-oracle parity on the
valid region, ragged-batch masking, and Kaldi-semantics spot checks."""

import numpy as np
import jax.numpy as jnp

from mfcc_tpu import oracle
from mfcc_tpu.ops import post


def _ragged_feats(rng, B=3, T=50, F=8):
    feat = rng.standard_normal((B, T, F)).astype(np.float32) * 3 + 1.5
    flens = np.asarray([T, T - 17, 5], np.int32)
    for b, n in enumerate(flens):
        feat[b, n:] = 0.0
    return feat, flens


# ---------------------------------------------------------------------------
# sliding CMVN
# ---------------------------------------------------------------------------

def test_sliding_cmvn_matches_oracle(rng):
    feat, flens = _ragged_feats(rng)
    for window in (9, 21, 600):
        got = np.asarray(post.sliding_cmvn(
            jnp.asarray(feat), jnp.asarray(flens), window))
        for b, n in enumerate(flens):
            want = oracle.sliding_cmvn(feat[b, :n].astype(np.float64),
                                       window)
            np.testing.assert_allclose(got[b, :n], want, atol=2e-5)
            assert (got[b, n:] == 0).all()


def test_sliding_cmvn_variance(rng):
    feat, flens = _ragged_feats(rng)
    got = np.asarray(post.sliding_cmvn(
        jnp.asarray(feat), jnp.asarray(flens), 15, normalize_variance=True))
    for b, n in enumerate(flens):
        want = oracle.sliding_cmvn(feat[b, :n].astype(np.float64), 15,
                                   normalize_variance=True)
        np.testing.assert_allclose(got[b, :n], want, atol=2e-4)


def test_sliding_cmvn_big_window_equals_global(rng):
    """window >= 2T-1 -> every frame sees the whole utterance: equals
    per-utterance mean subtraction."""
    feat, flens = _ragged_feats(rng)
    got = np.asarray(post.sliding_cmvn(
        jnp.asarray(feat), jnp.asarray(flens), 1001))
    for b, n in enumerate(flens):
        want = feat[b, :n] - feat[b, :n].mean(axis=0, keepdims=True)
        np.testing.assert_allclose(got[b, :n], want, atol=2e-5)


# ---------------------------------------------------------------------------
# splice
# ---------------------------------------------------------------------------

def test_splice_matches_oracle(rng):
    feat, flens = _ragged_feats(rng)
    got = np.asarray(post.splice(jnp.asarray(feat), jnp.asarray(flens),
                                 left=3, right=2))
    assert got.shape == (3, 50, 6 * 8)
    for b, n in enumerate(flens):
        want = oracle.splice(feat[b, :n].astype(np.float64), 3, 2)
        np.testing.assert_allclose(got[b, :n], want, atol=0)
        assert (got[b, n:] == 0).all()


def test_splice_center_column_is_identity(rng):
    feat, flens = _ragged_feats(rng)
    got = np.asarray(post.splice(jnp.asarray(feat), jnp.asarray(flens),
                                 left=2, right=2))
    np.testing.assert_array_equal(got[..., 16:24],
                                  feat * (got[..., 16:24] != 0))


# ---------------------------------------------------------------------------
# energy VAD
# ---------------------------------------------------------------------------

def test_vad_matches_oracle(rng):
    B, T = 2, 80
    le = rng.standard_normal((B, T)).astype(np.float32) * 2 - 10
    le[:, 20:40] += 8.0                      # loud segment
    flens = np.asarray([T, 55], np.int32)
    for ctx in (0, 3):
        got = np.asarray(post.energy_vad(
            jnp.asarray(le), jnp.asarray(flens), context=ctx))
        for b, n in enumerate(flens):
            want = oracle.energy_vad(le[b, :n].astype(np.float64),
                                     context=ctx)
            np.testing.assert_array_equal(got[b, :n], want)
            assert not got[b, n:].any()


def test_cli_cmvn_sliding_splice(tmp_path, rng):
    """--cmvn-sliding + --splice end-to-end: runner output matches the
    oracle post-processing chain (via the report self-check) and has
    the spliced width."""
    import json
    import jax.numpy as jnp
    from mfcc_tpu.utils import wav as wavio
    from mfcc_tpu import cli
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)
         + 0.02 * rng.standard_normal(16000)).astype(np.float32)
    wavio.write_wav(str(tmp_path / "u.wav"), x, 16000)
    out = tmp_path / "out"
    rc = cli.main([str(tmp_path / "u.wav"), "-o", str(out),
                   "--cmvn-sliding", "101", "--splice", "2"])
    assert rc == 0
    feat = np.load(out / "u.npy")
    assert feat.shape[1] == 13 * 5
    rep = json.load(open(out / "run_report.0.json"))
    assert rep["max_abs_error"] < 1e-4


def test_vad_detects_speech_segment(rng):
    """VAD on real pipeline energies: tone segment voiced, silence not."""
    from mfcc_tpu import FeatureConfig
    from mfcc_tpu.models import mfcc as mfcc_model
    cfg = FeatureConfig(append_energy=True).validate()
    sr = cfg.sample_rate
    t = np.arange(sr) / sr
    x = np.concatenate([
        0.5 * np.sin(2 * np.pi * 300 * t).astype(np.float32),
        (1e-4 * rng.standard_normal(sr)).astype(np.float32)])
    feat, flens, _ = mfcc_model.mfcc_batch_jit(
        jnp.asarray(x)[None], jnp.asarray([x.size], jnp.int32), cfg)
    vad = np.asarray(post.energy_vad(feat[..., 0], flens, context=2))[0]
    T = int(flens[0])
    assert vad[5: T // 2 - 5].all()
    assert not vad[T // 2 + 5: T - 5].any()
