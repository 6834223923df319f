"""Direct-to-training dataset iterator: parity, epochs, CMVN, augment."""

import numpy as np
import pytest
import jax.numpy as jnp

from mfcc_tpu import FeatureConfig, dataset, oracle
from mfcc_tpu.utils import wav

CFG = FeatureConfig().validate()


@pytest.fixture
def corpus(tmp_path, rng):
    sigs = {}
    for i, n in enumerate([16_000, 12_000, 20_000, 8_000, 16_000]):
        x = (0.3 * rng.standard_normal(n)).astype(np.float32)
        p = tmp_path / f"u{i}.wav"
        wav.write_wav(p, x, 16_000)
        # PCM16 round-trip: the decoded signal is the quantized one
        sigs[str(p)], _ = wav.read_wav(p)
    return tmp_path, sigs


def test_batches_match_oracle(corpus):
    root, sigs = corpus
    seen = {}
    for b in dataset.feature_batches(str(root), CFG, batch_size=2):
        assert b.features.ndim == 3 and b.features.shape[2] == CFG.n_mfcc
        for i, uid in enumerate(b.uids):
            if uid is None:
                continue
            n = int(b.frame_counts[i])
            seen[uid] = np.asarray(b.features[i, :n])
            # padding frames zero
            assert np.all(np.asarray(b.features[i, n:]) == 0.0)
    assert set(seen) == set(sigs)
    for uid, got in seen.items():
        want = oracle.mfcc(sigs[uid].astype(np.float64), CFG)
        np.testing.assert_allclose(got, want[: got.shape[0]], atol=1e-4)


def test_epochs_and_shuffle(corpus):
    root, sigs = corpus
    orders = list(_epoch_orders(str(root), epochs=2, seed=0))
    # every epoch covers the whole corpus exactly once
    assert sorted(orders[0]) == sorted(orders[1]) == sorted(sigs)
    # reproducible: same seed -> same orders
    again = list(_epoch_orders(str(root), epochs=2, seed=0))
    assert orders == again
    # different epochs see different orders (5 utts: collision chance 1/120)
    assert orders[0] != orders[1]


def _epoch_orders(root, epochs, seed):
    out = []
    cur = []
    last_epoch_len = 5
    for b in dataset.feature_batches(root, CFG, batch_size=2, epochs=epochs,
                                     shuffle_seed=seed):
        cur += [u for u in b.uids if u is not None]
        if len(cur) == last_epoch_len:
            out.append(cur)
            cur = []
    return out


def test_cmvn_stats_applied(corpus, tmp_path):
    root, sigs = corpus
    from mfcc_tpu.parallel import cmvn as cmvn_lib
    # accumulate stats over the corpus, then verify normalized moments
    stats = cmvn_lib.Stats.zero(CFG.n_mfcc)
    for b in dataset.feature_batches(str(root), CFG, batch_size=2):
        f = np.asarray(b.features, np.float64)
        m = np.asarray(b.mask)
        stats = stats.merge(cmvn_lib.Stats(
            count=np.float64(m.sum()), sum=f.sum((0, 1)),
            sumsq=(f * f).sum((0, 1))))
    allf = []
    for b in dataset.feature_batches(str(root), CFG, batch_size=2,
                                     cmvn_stats=stats):
        f = np.asarray(b.features)
        allf.append(f[np.asarray(b.mask)])
    z = np.concatenate(allf)
    np.testing.assert_allclose(z.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(z.std(0), 1.0, atol=1e-3)


def test_augment_reproducible_and_fresh_per_epoch(corpus):
    root, _ = corpus
    def run():
        return [np.asarray(b.features) for b in dataset.feature_batches(
            str(root), CFG, batch_size=2, epochs=2, augment_seed=7)]
    a, b = run(), run()
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    n = len(a) // 2
    # same corpus order, different masks across epochs
    assert any(not np.array_equal(a[i], a[i + n]) for i in range(n))


def test_drop_padded_rows(corpus):
    root, _ = corpus
    for b in dataset.feature_batches(str(root), CFG, batch_size=3,
                                     drop_padded_rows=True):
        assert all(u is not None for u in b.uids)
        assert b.features.shape[0] == len(b.uids)
