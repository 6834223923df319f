"""Test env: fake 8-device CPU pod (SURVEY.md §4 takeaway).

Must set env before jax is imported anywhere — hence top of conftest.
All tests run on CPU with 8 virtual devices so sharding/collective paths
(the "fake backend" the reference never needed) are exercised without TPU
hardware.  Pallas kernels run under interpret=True on CPU (see kernels/).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses we spawn

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# jax may already be imported (the image's sitecustomize registers the TPU
# plugin at interpreter start and snapshots JAX_PLATFORMS=axon), so env vars
# are too late here — force the platform through jax.config instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compile cache: the parity matrix spans many configs and the
# f32-HIGHEST GEMMs are slow to compile on the CPU backend
jax.config.update("jax_compilation_cache_dir", "/tmp/mfcc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture()
def rng():
    # function-scoped: each test gets the same deterministic stream
    # regardless of execution order (a session-scoped rng made test DATA
    # depend on which tests ran before — order-dependent flakes)
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def speechlike():
    """1.0 s of speech-like 16 kHz audio: harmonics + noise, f32 in [-1,1]."""
    g = np.random.default_rng(777)
    sr = 16000
    t = np.arange(sr) / sr
    f0 = 110.0 * (1.0 + 0.3 * np.sin(2 * np.pi * 2.5 * t))
    sig = sum((0.5 / k) * np.sin(2 * np.pi * k * np.cumsum(f0) / sr)
              for k in range(1, 6))
    sig = sig + 0.01 * g.standard_normal(sr)
    sig = 0.8 * sig / np.max(np.abs(sig))
    return sig.astype(np.float32)
