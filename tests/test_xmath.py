"""Accuracy tests for the custom log (and documentation of why it exists:
XLA's hardware f32 log approximation errs ~1e-4 absolute)."""

import numpy as np
import jax.numpy as jnp

from mfcc_tpu.ops import xmath


def test_accurate_log_wide_range():
    x = np.concatenate([
        np.logspace(-30, 30, 200001),
        np.linspace(0.5, 4.0, 100001),
    ]).astype(np.float32)
    got = np.asarray(xmath.accurate_log(jnp.asarray(x)))
    want = np.log(x.astype(np.float64))
    err = np.abs(got - want)
    # ~1 output ulp: absolute floor + rounding proportional to |log x|
    bound = 1e-6 + 2.4e-7 * np.abs(want)
    assert np.all(err < bound), (err / bound).max()


def test_accurate_log_near_one():
    x = (1.0 + np.linspace(-0.4, 0.4, 100001)).astype(np.float32)
    got = np.asarray(xmath.accurate_log(jnp.asarray(x)))
    want = np.log(x.astype(np.float64))
    assert np.abs(got - want).max() < 1e-6


def test_hardware_log_is_why_this_exists():
    """If this starts failing, XLA's log became accurate and xmath could
    be retired (keep it anyway for cross-backend determinism)."""
    x = np.linspace(0.01, 10, 100001).astype(np.float32)
    hw_err = np.abs(np.asarray(jnp.log(jnp.asarray(x)))
                    - np.log(x.astype(np.float64))).max()
    ours = np.abs(np.asarray(xmath.accurate_log(jnp.asarray(x)))
                  - np.log(x.astype(np.float64))).max()
    assert ours < hw_err or hw_err < 1e-6


def test_floored_log():
    x = np.array([0.0, 1e-20, 1e-3, 1.0], np.float32)
    got = np.asarray(xmath.floored_log(jnp.asarray(x), 1e-10))
    want = np.log(np.maximum(x.astype(np.float64), 1e-10))
    np.testing.assert_allclose(got, want, atol=1e-6)
