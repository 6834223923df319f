"""Feature post-processing (ops/post.py): float64-oracle parity on the
valid region, ragged-batch masking, and Kaldi-semantics spot checks."""

import numpy as np
import jax.numpy as jnp

from mfcc_tpu import oracle
from mfcc_tpu.ops import post


def _ragged_feats(rng, B=3, T=50, F=8):
    feat = rng.standard_normal((B, T, F)).astype(np.float32) * 3 + 1.5
    # ragged pattern derived from B (first row always full-length)
    pattern = [T, max(T - 17, 1), min(5, T)]
    flens = np.asarray((pattern * (B // 3 + 1))[:B], np.int32)
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


# ---------------------------------------------------------------------------
# online (causal) CMVN — batch op, streaming step, oracle: one contract
# ---------------------------------------------------------------------------

def test_online_cmvn_matches_oracle(rng):
    feat, flens = _ragged_feats(rng)
    for window, nv in ((7, False), (20, True), (600, True)):
        got = np.asarray(post.online_cmvn(
            jnp.asarray(feat), jnp.asarray(flens), window,
            normalize_variance=nv))
        for b, n in enumerate(flens):
            want = oracle.online_cmvn(feat[b, :n].astype(np.float64),
                                      window, normalize_variance=nv)
            np.testing.assert_allclose(got[b, :n], want, atol=2e-5)
            assert not got[b, n:].any()


def test_online_cmvn_is_causal(rng):
    """Changing future frames must not change past outputs."""
    feat, flens = _ragged_feats(rng, B=1, T=40)
    got1 = np.asarray(post.online_cmvn(
        jnp.asarray(feat), jnp.asarray([40], np.int32), 11))
    feat2 = feat.copy()
    feat2[0, 25:] += 100.0
    got2 = np.asarray(post.online_cmvn(
        jnp.asarray(feat2), jnp.asarray([40], np.int32), 11))
    np.testing.assert_array_equal(got1[0, :25], got2[0, :25])
    assert np.abs(got1[0, 25:] - got2[0, 25:]).max() > 1.0


def test_online_cmvn_prior(rng):
    """Prior stats dominate the first frames and decay to no effect once
    the causal window is full."""
    feat, _ = _ragged_feats(rng, B=1, T=60)
    window = 12
    pc = 100.0
    ps = np.full((8,), 5.0 * pc, np.float32)          # prior mean 5.0
    pss = (np.full((8,), 25.0, np.float32) + 4.0) * pc  # prior var 4.0
    prior = (pc, ps, pss)
    flens = jnp.asarray([60], jnp.int32)
    got = np.asarray(post.online_cmvn(jnp.asarray(feat), flens, window,
                                      prior=prior))
    want = oracle.online_cmvn(feat[0].astype(np.float64), window,
                              prior=(pc, ps.astype(np.float64),
                                     pss.astype(np.float64)))
    np.testing.assert_allclose(got[0], want, atol=2e-5)
    # frame 0: window holds 1 frame + 11 prior frames -> prior-dominated
    mean0 = (feat[0, 0] + 11.0 * 5.0) / 12.0
    np.testing.assert_allclose(got[0, 0], feat[0, 0] - mean0, atol=1e-5)
    # once g+1 >= window the prior weight is zero -> equals no-prior path
    nopri = np.asarray(post.online_cmvn(jnp.asarray(feat), flens, window))
    np.testing.assert_array_equal(got[0, window - 1:], nopri[0, window - 1:])


def test_streaming_online_cmvn_matches_batch(rng):
    """Carry-state streaming normalization == batch online_cmvn on the
    same frames, invariant to how the stream is chunked (including
    chunks with zero/partial validity)."""
    from mfcc_tpu.models import streaming
    T, F, window = 47, 13, 15
    feat = (rng.standard_normal((T, F)) * 2 + 0.7).astype(np.float32)
    want = np.asarray(post.online_cmvn(
        jnp.asarray(feat)[None], jnp.asarray([T], jnp.int32), window,
        normalize_variance=True))[0]
    for S, valids in ((8, None), (5, [0, 3, 5, 5, 1, 5, 5, 5, 5, 5, 5, 5])):
        st = streaming.init_online_cmvn(window, F)
        got, done = [], 0
        k = 0
        while done < T:
            nv = min(S if valids is None else valids[k], T - done)
            k += 1
            chunk = np.zeros((S, F), np.float32)
            chunk[:nv] = feat[done: done + nv]
            st, out = streaming.online_cmvn_step(
                st, jnp.asarray(chunk), jnp.asarray(nv, jnp.int32),
                window, normalize_variance=True)
            got.append(np.asarray(out)[:nv])
            done += nv
        got = np.concatenate(got)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_streaming_online_cmvn_end_to_end(speechlike, rng):
    """Full serving chain: streamed MFCC -> streamed online CMVN equals
    the batch pipeline + batch online_cmvn on the same signal."""
    from mfcc_tpu import FeatureConfig
    from mfcc_tpu.models import streaming, mfcc as mfcc_model
    cfg = FeatureConfig()
    window = 30
    x = speechlike[: 9600]                    # 0.6 s = 6 chunks of 0.1 s
    batch = np.asarray(mfcc_model.mfcc_jit(jnp.asarray(x), cfg))
    want = np.asarray(post.online_cmvn(
        jnp.asarray(batch)[None],
        jnp.asarray([batch.shape[0]], jnp.int32), window))[0]
    st = streaming.init_state(cfg)
    cst = streaming.init_online_cmvn(window, cfg.n_mfcc)
    C = 10 * cfg.hop_len
    got = []
    for i in range(x.size // C):
        st, feat, nv = streaming.process_chunk_jit(
            st, jnp.asarray(x[i * C: (i + 1) * C]), cfg)
        cst, out = streaming.online_cmvn_step(cst, feat, nv, window)
        got.append(np.asarray(out)[: int(nv)])
    got = np.concatenate(got)
    np.testing.assert_allclose(got, want[: got.shape[0]], atol=1e-5)
