"""Pallas kernel parity in interpret mode (the TPU 'sanitizer' run —
SURVEY.md §5): the fused kernel must match the float64 oracle within the
pipeline tolerance and the jnp path within float noise."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mfcc_tpu import FeatureConfig, oracle
from mfcc_tpu.ops import framing
from mfcc_tpu.ops.kernels import (fused_dit, fused_mfcc, fused_raw,
                                  fused_raw_dit)
from mfcc_tpu.models import mfcc as mfcc_model

ATOL = 1e-4
CFG = FeatureConfig()


def _preemph(x):
    return jnp.asarray(framing.preemphasize(jnp.asarray(x), CFG))


def test_fused_kernel_matches_oracle(rng):
    x = (rng.standard_normal((2, 16000)) * 0.3).astype(np.float32)
    got = np.asarray(fused_mfcc.fused_features(_preemph(x), CFG,
                                               interpret=True))
    assert got.shape == (2, 98, 13)
    for b in range(2):
        want = oracle.mfcc(x[b].astype(np.float64), CFG)
        np.testing.assert_allclose(got[b], want, atol=ATOL)


def test_fused_kernel_matches_jnp_path(rng):
    x = (rng.standard_normal((3, 12000)) * 0.3).astype(np.float32)
    lens = np.full((3,), 12000, np.int32)
    got = np.asarray(fused_mfcc.fused_features(_preemph(x), CFG,
                                               interpret=True))
    want, flens, _ = mfcc_model.mfcc_batch_jit(
        jnp.asarray(x), jnp.asarray(lens), CFG)
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5)


def test_fused_kernel_non_tile_multiple_frames(rng):
    """T = 98 frames with tile 64 -> 2 tiles with padding; padded frames
    must not leak into real output."""
    x = (rng.standard_normal((1, 16000)) * 0.3).astype(np.float32)
    got = np.asarray(fused_mfcc.fused_features(
        _preemph(x), CFG, tile_t=64, interpret=True))
    want = oracle.mfcc(x[0].astype(np.float64), CFG)
    assert got.shape == (1, 98, 13)
    np.testing.assert_allclose(got[0], want, atol=ATOL)


def test_fused_kernel_logmel_mode(rng):
    cfg = FeatureConfig(n_mels=80, n_mfcc=80).validate()
    x = (rng.standard_normal((2, 8000)) * 0.3).astype(np.float32)
    y = framing.preemphasize(jnp.asarray(x), cfg)
    got = np.asarray(fused_mfcc.fused_features(
        y, cfg, apply_dct=False, interpret=True))
    assert got.shape == (2, cfg.num_frames(8000), 80)
    for b in range(2):
        want = oracle.log_mel(x[b].astype(np.float64), cfg)
        np.testing.assert_allclose(got[b], want, atol=ATOL)


def test_fused_kernel_append_energy(rng):
    cfg = CFG.replace(append_energy=True)
    x = (rng.standard_normal((1, 8000)) * 0.3).astype(np.float32)
    y = framing.preemphasize(jnp.asarray(x), cfg)
    got = np.asarray(fused_mfcc.fused_features(y, cfg, interpret=True))
    want = oracle.mfcc(x[0].astype(np.float64), cfg)
    np.testing.assert_allclose(got[0], want, atol=ATOL)


def test_fused_kernel_short_signal():
    y = jnp.zeros((1, 300), jnp.float32)     # < frame_len
    got = fused_mfcc.fused_features(y, CFG, interpret=True)
    assert got.shape == (1, 0, 13)


# ---------------------------------------------------------------------------
# fused_dit: the radix-2 VMEM kernel (golden TPU path)
# ---------------------------------------------------------------------------

def test_dit_kernel_matches_oracle(rng):
    x = (rng.standard_normal((2, 16000)) * 0.3).astype(np.float32)
    assert fused_dit.dit_kernel_eligible(CFG)
    got = np.asarray(fused_dit.fused_features_dit(_preemph(x), CFG,
                                                  interpret=True))
    assert got.shape == (2, 98, 13)
    for b in range(2):
        want = oracle.mfcc(x[b].astype(np.float64), CFG)
        np.testing.assert_allclose(got[b], want, atol=ATOL)


def test_dit_kernel_matches_jnp_dit_path(rng):
    """Same factorization in jnp (dit2c) vs in the kernel: float noise."""
    x = (rng.standard_normal((2, 12000)) * 0.3).astype(np.float32)
    cfg = FeatureConfig(dft_algorithm="dit2c").validate()
    y = framing.preemphasize(jnp.asarray(x), cfg)
    got = np.asarray(fused_dit.fused_features_dit(y, cfg, interpret=True))
    lens = np.full((2,), 12000, np.int32)
    want, _, _ = mfcc_model.mfcc_batch_jit(
        jnp.asarray(x), jnp.asarray(lens), cfg)
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("variant", [
    dict(),                               # 400/160: nbe=nbo=3, K 240->256
    dict(frame_ms=25.0625),               # frame_len 401: uneven streams
    dict(n_fft=1024),                     # nb2 = 256
    dict(sample_rate=8000, n_fft=256, n_mels=20),  # nb2 = 64
    dict(append_energy=True),
    dict(lifter=22),
    dict(dynamic_range_db=80.0),
])
def test_dit_kernel_variants_vs_oracle(rng, variant):
    cfg = FeatureConfig(**variant).validate()
    if not fused_dit.dit_kernel_eligible(cfg):
        pytest.skip("config not DIT-kernel eligible")
    n = cfg.sample_rate
    x = (rng.standard_normal((1, n)) * 0.3).astype(np.float32)
    y = framing.preemphasize(jnp.asarray(x), cfg)
    got = np.asarray(fused_dit.fused_features_dit(y, cfg, interpret=True))
    want = oracle.mfcc(x[0].astype(np.float64), cfg)
    assert got.shape[1:] == want.shape
    # liftering scales coefficient i by up to 1 + lifter/2 (~12x at 22),
    # amplifying f32 noise by the same factor: compare in the unliftered
    # space so the 1e-4 contract means the same thing for every variant
    lift = oracle.lifter_coeffs(cfg.n_mfcc, cfg.lifter)
    np.testing.assert_allclose(got[0] / lift, want / lift, atol=ATOL)


def test_dit_kernel_logmel_mode(rng):
    cfg = FeatureConfig(n_mels=80, n_mfcc=80).validate()
    x = (rng.standard_normal((2, 8000)) * 0.3).astype(np.float32)
    y = framing.preemphasize(jnp.asarray(x), cfg)
    got = np.asarray(fused_dit.fused_features_dit(
        y, cfg, apply_dct=False, interpret=True))
    assert got.shape == (2, cfg.num_frames(8000), 80)
    p = np.asarray(y[0], np.float64)
    # interpret-mode parity vs a float64 log-mel of the same preemph signal
    from mfcc_tpu.models import logmel as logmel_model
    want, _, _ = logmel_model.log_mel_batch_jit(
        jnp.asarray(x), jnp.asarray(np.full((2,), 8000, np.int32)), cfg)
    # deep spectral valleys are f32-limited in ABSOLUTE log terms
    # (docs/conventions.md): two exact-f32 pipelines legitimately differ
    # there, so bound the relative log error plus a small absolute floor
    np.testing.assert_allclose(got, np.asarray(want)[:, :got.shape[1]],
                               rtol=1e-4, atol=2e-5)


def test_dit_kernel_non_tile_multiple(rng):
    x = (rng.standard_normal((1, 16000)) * 0.3).astype(np.float32)
    got = np.asarray(fused_dit.fused_features_dit(
        _preemph(x), CFG, tile_t=64, interpret=True))
    want = oracle.mfcc(x[0].astype(np.float64), CFG)
    assert got.shape == (1, 98, 13)
    np.testing.assert_allclose(got[0], want, atol=ATOL)


# ---------------------------------------------------------------------------
# fused_raw: the zero-prep raw-audio kernel (v3)
# ---------------------------------------------------------------------------

def test_raw_kernel_matches_oracle(rng):
    """Raw audio in (pre-emphasis inside the kernel) -> oracle parity."""
    x = (rng.standard_normal((2, 16000)) * 0.3).astype(np.float32)
    assert fused_raw.raw_kernel_eligible(CFG)
    got = np.asarray(fused_raw.fused_features_raw(jnp.asarray(x), CFG,
                                                  interpret=True))
    assert got.shape == (2, 98, 13)
    for b in range(2):
        want = oracle.mfcc(x[b].astype(np.float64), CFG)
        np.testing.assert_allclose(got[b], want, atol=ATOL)


def test_raw_kernel_matches_jnp_path(rng):
    x = (rng.standard_normal((3, 12000)) * 0.3).astype(np.float32)
    lens = np.full((3,), 12000, np.int32)
    got = np.asarray(fused_raw.fused_features_raw(jnp.asarray(x), CFG,
                                                  interpret=True))
    want, _, _ = mfcc_model.mfcc_batch_jit(
        jnp.asarray(x), jnp.asarray(lens), CFG, "xla")
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("variant", [
    dict(),                               # hop 160: P=4, rpp=5
    dict(frame_ms=25.0625),               # frame_len 401 (odd tail)
    dict(n_fft=1024),
    dict(sample_rate=8000, n_fft=256, n_mels=20),  # hop 80: P=8
    dict(append_energy=True),
    dict(lifter=22),
    dict(dynamic_range_db=80.0),
    dict(preemph=0.0),                    # preemph branch compiled out
])
def test_raw_kernel_variants_vs_oracle(rng, variant):
    cfg = FeatureConfig(**variant).validate()
    if not fused_raw.raw_kernel_eligible(cfg):
        pytest.skip("config not raw-kernel eligible")
    n = cfg.sample_rate
    x = (rng.standard_normal((1, n)) * 0.3).astype(np.float32)
    got = np.asarray(fused_raw.fused_features_raw(jnp.asarray(x), cfg,
                                                  interpret=True))
    want = oracle.mfcc(x[0].astype(np.float64), cfg)
    assert got.shape[1:] == want.shape
    lift = oracle.lifter_coeffs(cfg.n_mfcc, cfg.lifter)
    np.testing.assert_allclose(got[0] / lift, want / lift, atol=ATOL)


def test_raw_kernel_logmel_mode(rng):
    cfg = FeatureConfig(n_mels=80, n_mfcc=80).validate()
    x = (rng.standard_normal((2, 8000)) * 0.3).astype(np.float32)
    got = np.asarray(fused_raw.fused_features_raw(
        jnp.asarray(x), cfg, apply_dct=False, interpret=True))
    assert got.shape == (2, cfg.num_frames(8000), 80)
    for b in range(2):
        want = oracle.log_mel(x[b].astype(np.float64), cfg)
        np.testing.assert_allclose(got[b], want, atol=ATOL)


def test_raw_kernel_non_tile_multiple(rng):
    """98 frames with tile 64 (2 tiles + padding); padded frames must not
    leak, and the double-buffered DMA must stay in range at the tail."""
    x = (rng.standard_normal((1, 16000)) * 0.3).astype(np.float32)
    got = np.asarray(fused_raw.fused_features_raw(
        jnp.asarray(x), CFG, tile_t=64, interpret=True))
    want = oracle.mfcc(x[0].astype(np.float64), CFG)
    assert got.shape == (1, 98, 13)
    np.testing.assert_allclose(got[0], want, atol=ATOL)


def test_raw_kernel_multi_batch_multi_tile(rng):
    """Batch x tiles exercises the flattened double-buffer step index."""
    x = (rng.standard_normal((4, 48000)) * 0.3).astype(np.float32)
    got = np.asarray(fused_raw.fused_features_raw(
        jnp.asarray(x), CFG, tile_t=128, interpret=True))
    assert got.shape == (4, 298, 13)
    for b in range(4):
        want = oracle.mfcc(x[b].astype(np.float64), CFG)
        np.testing.assert_allclose(got[b], want, atol=ATOL)


@pytest.mark.parametrize("variant", [
    dict(),                               # hop 160: P=4, phases 2,3 cross
    dict(append_energy=True),
    dict(n_mels=80, dynamic_range_db=50.0),
])
def test_raw_kernel_merged_matches_split(rng, variant):
    """v3 merged-phase path (one (P*fpp, frame_len) GEMM via VMEM
    roll+select assembly — the fused_raw_dit v5 lever) is
    value-equivalent to the per-phase path."""
    cfg = FeatureConfig(**variant).validate()
    if not fused_raw.raw_kernel_eligible(cfg):
        pytest.skip("config not raw-kernel eligible")
    dct = "n_mels" not in variant
    x = (rng.standard_normal((2, 16000)) * 0.3).astype(np.float32)
    split = np.asarray(fused_raw.fused_features_raw(
        jnp.asarray(x), cfg, apply_dct=dct, interpret=True))
    merged = np.asarray(fused_raw.fused_features_raw(
        jnp.asarray(x), cfg, apply_dct=dct, merged=True, interpret=True))
    np.testing.assert_allclose(merged, split, atol=1e-4)
    want = (oracle.mfcc if dct else oracle.log_mel)(
        x[0].astype(np.float64), cfg)
    np.testing.assert_allclose(merged[0], want, atol=ATOL)


def test_raw_kernel_ineligible_configs():
    assert not fused_raw.raw_kernel_eligible(
        FeatureConfig(sample_rate=22050))       # hop 220 -> P=32
    with pytest.raises(ValueError):
        fused_raw.fused_features_raw(
            jnp.zeros((1, 22050), jnp.float32),
            FeatureConfig(sample_rate=22050), interpret=True)


def test_raw_kernel_short_signal():
    x = jnp.zeros((1, 300), jnp.float32)     # < frame_len
    got = fused_raw.fused_features_raw(x, CFG, interpret=True)
    assert got.shape == (1, 0, 13)


def test_pallas_backend_routes_to_raw_dit(rng):
    """backend='pallas' end-to-end (interpret on CPU) picks the merged
    raw-DIT kernel for cepstral configs AND for log-mel with a bounded
    (<= 50 dB) dynamic range (its valley error there is test-pinned at
    5.3e-5); unbounded-range log-mel keeps the v3 raw kernel (valley
    accuracy policy).  All three route choices must match the oracle."""
    from mfcc_tpu.models import logmel as logmel_model
    x = (rng.standard_normal(16000) * 0.3).astype(np.float32)
    got = np.asarray(mfcc_model.mfcc_jit(jnp.asarray(x), CFG, "pallas"))
    want = oracle.mfcc(x.astype(np.float64), CFG)
    np.testing.assert_allclose(got, want, atol=ATOL)
    cfg = FeatureConfig(n_mels=40, n_mfcc=40,
                        dynamic_range_db=50.0).validate()   # -> raw-DIT
    got = np.asarray(logmel_model.log_mel_jit(jnp.asarray(x), cfg,
                                              "pallas"))
    want = oracle.log_mel(x.astype(np.float64), cfg)
    np.testing.assert_allclose(got, want, atol=ATOL)
    cfg_u = FeatureConfig(n_mels=40, n_mfcc=40).validate()  # -> v3 raw
    got = np.asarray(logmel_model.log_mel_jit(jnp.asarray(x), cfg_u,
                                              "pallas"))
    want = oracle.log_mel(x.astype(np.float64), cfg_u)
    np.testing.assert_allclose(got, want, atol=2e-4)  # unbounded valleys


# ---------------------------------------------------------------------------
# fused_raw_dit: radix-2 DIT on the zero-prep raw layout (v4)
# ---------------------------------------------------------------------------

def test_raw_dit_kernel_matches_oracle(rng):
    """Raw audio in (parity deinterleave in the wrapper, pre-emphasis
    inside the kernel, DIT combine with the bin permutation folded into
    the mel matrix) -> oracle parity."""
    x = (rng.standard_normal((2, 16000)) * 0.3).astype(np.float32)
    assert fused_raw_dit.raw_dit_kernel_eligible(CFG)
    got = np.asarray(fused_raw_dit.fused_features_raw_dit(
        jnp.asarray(x), CFG, interpret=True))
    assert got.shape == (2, 98, 13)
    for b in range(2):
        want = oracle.mfcc(x[b].astype(np.float64), CFG)
        np.testing.assert_allclose(got[b], want, atol=ATOL)


def test_raw_dit_kernel_matches_jnp_path(rng):
    x = (rng.standard_normal((3, 12000)) * 0.3).astype(np.float32)
    lens = np.full((3,), 12000, np.int32)
    got = np.asarray(fused_raw_dit.fused_features_raw_dit(
        jnp.asarray(x), CFG, interpret=True))
    want, _, _ = mfcc_model.mfcc_batch_jit(
        jnp.asarray(x), jnp.asarray(lens), CFG, "xla")
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("variant", [
    dict(),                               # hop 160: hop/2=80 -> P=8
    dict(frame_ms=25.0625),               # frame_len 401 (odd parity split)
    dict(n_fft=1024),
    dict(append_energy=True),
    dict(lifter=22),
    dict(dynamic_range_db=80.0),
    dict(preemph=0.0),                    # preemph branch compiled out
    dict(frame_ms=32.0, hop_ms=16.0),     # hop 256: hop/2=128 -> P=1
    dict(vtln_warp=1.1),
    dict(sample_rate=8000, n_fft=256),    # telephone speech: P=16 (r4)
    dict(sample_rate=48000, n_fft=2048),  # studio rate: P=8, 15-row period
])
def test_raw_dit_kernel_variants_vs_oracle(rng, variant):
    cfg = FeatureConfig(**variant).validate()
    if not fused_raw_dit.raw_dit_kernel_eligible(cfg):
        pytest.skip("config not raw-DIT-kernel eligible")
    n = cfg.sample_rate
    x = (rng.standard_normal((1, n)) * 0.3).astype(np.float32)
    got = np.asarray(fused_raw_dit.fused_features_raw_dit(
        jnp.asarray(x), cfg, interpret=True))
    want = oracle.mfcc(x[0].astype(np.float64), cfg)
    assert got.shape[1:] == want.shape
    lift = oracle.lifter_coeffs(cfg.n_mfcc, cfg.lifter)
    np.testing.assert_allclose(got[0] / lift, want / lift, atol=ATOL)


@pytest.mark.parametrize("half", [False, True])
@pytest.mark.parametrize("variant", [
    dict(),                               # hop 160: crossing phases 6,7
    dict(frame_ms=25.0625),               # odd frame_len (Le != Lo)
    dict(append_energy=True),             # energy column via Fe/Fo sums
    dict(frame_ms=32.0, hop_ms=16.0),     # P=1: merged ineligible — the
                                          # half/pm_out wrapper transforms
                                          # must gate off (ADVICE r3)
    dict(dynamic_range_db=80.0),
])
def test_raw_dit_kernel_merged_matches_split(rng, variant, half):
    """v5 merged-phase path (ONE (P*fpp, L) GEMM per parity via VMEM
    roll+select frame-block assembly) is value-equivalent to the v4
    per-phase path, and both to the oracle.  half=True additionally
    covers the 128-lane combine variant, INCLUDING configs where the
    merged path is ineligible (P=1) and the wrapper's mcat/mny row swap
    must therefore not be applied (the r3 advisor bug)."""
    cfg = FeatureConfig(**variant).validate()
    if not fused_raw_dit.raw_dit_kernel_eligible(cfg):
        pytest.skip("config not raw-DIT-kernel eligible")
    n = cfg.sample_rate
    x = (rng.standard_normal((2, n)) * 0.3).astype(np.float32)
    split = np.asarray(fused_raw_dit.fused_features_raw_dit(
        jnp.asarray(x), cfg, interpret=True))
    merged = np.asarray(fused_raw_dit.fused_features_raw_dit(
        jnp.asarray(x), cfg, merged=True, half=half, interpret=True))
    np.testing.assert_allclose(merged, split, atol=2e-5)
    want = oracle.mfcc(x[0].astype(np.float64), cfg)
    lift = oracle.lifter_coeffs(cfg.n_mfcc, cfg.lifter)
    np.testing.assert_allclose(merged[0] / lift, want / lift, atol=ATOL)


def test_logmel_append_energy_not_substituted_by_kernels(rng):
    """r4 review finding: every kernel substituted log frame energy into
    band 0 even for LOG-MEL outputs, where the XLA reference gates the
    substitution on cepstral output (c0 slot).  ALL FOUR kernel log-mel
    routes must match the XLA path with append_energy=True:
    raw-DIT v5 (50 dB route), v3 raw (unbounded route), fused_dit
    (hop 132: half-rate P=64 makes both raw kernels ineligible), and
    fused_mfcc (odd hop 161 additionally breaks DIT parity)."""
    from mfcc_tpu.models import logmel as logmel_model
    from mfcc_tpu.ops.kernels import fused_dit, fused_mfcc
    base = dict(n_mels=40, n_mfcc=40, append_energy=True)
    cfg_v5 = FeatureConfig(**base, dynamic_range_db=50.0).validate()
    cfg_v3 = FeatureConfig(**base).validate()
    cfg_dit = FeatureConfig(**base, hop_ms=8.25).validate()
    cfg_dir = FeatureConfig(**base, hop_ms=10.0625).validate()
    assert not fused_raw.raw_kernel_eligible(cfg_dit)
    assert not fused_raw_dit.raw_dit_kernel_eligible(cfg_dit)
    assert fused_dit.dit_kernel_eligible(cfg_dit)
    assert not fused_dit.dit_kernel_eligible(cfg_dir)   # -> fused_mfcc
    x = (rng.standard_normal(16000) * 0.3).astype(np.float32)
    for c in (cfg_v5, cfg_v3, cfg_dit, cfg_dir):
        pal = np.asarray(logmel_model.log_mel_jit(jnp.asarray(x), c,
                                                  "pallas"))
        xla = np.asarray(logmel_model.log_mel_jit(jnp.asarray(x), c,
                                                  "xla"))
        np.testing.assert_allclose(pal[:, 0], xla[:, 0], atol=2e-4)


@pytest.mark.parametrize("kw", [
    dict(),
    dict(sample_rate=8000, n_fft=256),            # raw-DIT P=16
    dict(hop_ms=8.25),                            # -> fused_dit
    dict(hop_ms=10.0625),                         # odd hop -> fused_mfcc
    dict(frame_ms=32.0, hop_ms=16.0),             # P=1 plan
    dict(sample_rate=48000, n_fft=2048),
    dict(sample_rate=22050, n_fft=1024),
    dict(n_mels=80, n_mfcc=80, dynamic_range_db=50.0),
    dict(append_energy=True, lifter=22, deltas=True),
])
def test_pallas_route_matches_xla_any_config(rng, kw):
    """Route fuzz: whatever kernel the pallas backend picks for a config
    (interpret on CPU), the result must match the XLA reference path —
    the broad safety net over routing/planning changes (each kernel also
    has its own oracle-parity tests)."""
    cfg = FeatureConfig(**kw).validate()
    n = cfg.sample_rate
    x = (rng.standard_normal((2, n)) * 0.3).astype(np.float32)
    l = jnp.asarray([n, n - n // 3], jnp.int32)
    pal, fp, _ = mfcc_model.mfcc_batch_jit(jnp.asarray(x), l, cfg,
                                           "pallas")
    xla, fx, _ = mfcc_model.mfcc_batch_jit(jnp.asarray(x), l, cfg, "xla")
    np.testing.assert_array_equal(np.asarray(fp), np.asarray(fx))
    np.testing.assert_allclose(np.asarray(pal), np.asarray(xla),
                               atol=2e-4)


def test_high_precision_routes_to_xla(rng):
    """Mosaic has no in-kernel HIGH (bf16x3) dot lowering (measured r4:
    NotImplementedError at pallas lowering); matmul_precision='high'
    must resolve to the XLA path even under backend='pallas'."""
    from mfcc_tpu import backend as backend_lib
    cfg = FeatureConfig(matmul_precision="high").validate()
    assert backend_lib.resolve("pallas", cfg) == "xla"
    assert backend_lib.resolve("auto", cfg) == "xla"
    x = (rng.standard_normal((1, 8000)) * 0.3).astype(np.float32)
    l = jnp.asarray([8000], jnp.int32)
    a = np.asarray(mfcc_model.mfcc_batch_jit(jnp.asarray(x), l, cfg,
                                             "pallas")[0])
    b = np.asarray(mfcc_model.mfcc_batch_jit(jnp.asarray(x), l, cfg,
                                             "xla")[0])
    np.testing.assert_array_equal(a, b)


def test_spec_kernel_eligibility_requires_aligned_H():
    """r4 review finding: _spec_pack's Nyquist concat needs H = n_fft/2
    lane-aligned; n_fft=400 (H=200) is raw-DIT eligible but must NOT
    take the spec route (Mosaic rejects the unaligned lane concat on
    hardware — interpret mode cannot catch it)."""
    cfg400 = FeatureConfig(n_fft=400).validate()
    assert fused_raw_dit.raw_dit_kernel_eligible(cfg400)
    assert not fused_raw_dit.spec_kernel_eligible(cfg400)
    assert fused_raw_dit.spec_kernel_eligible(FeatureConfig().validate())


def test_raw_dit_kernel_pm_out_ineligible_config_gates_off(rng):
    """The second r3 advisor repro: a config whose frame does not fit one
    period row (frame_len 300 > row_lanes 128 at hop 128) must silently
    drop pm_out/half and still match the per-phase baseline."""
    cfg = FeatureConfig(sample_rate=16000, frame_ms=18.75,
                        hop_ms=8.0).validate()   # frame 300, hop 128: P=2
    if not fused_raw_dit.raw_dit_kernel_eligible(cfg):
        pytest.skip("config not raw-DIT-kernel eligible")
    plan = fused_raw_dit._plan(cfg, 64, True, merged=True, pm_out=True,
                               half=True)
    assert plan.P == 2 and plan.Le > plan.rpp * 128  # frame > period row
    assert not plan.merged and not plan.pm_out and not plan.half
    x = (rng.standard_normal((1, 8000)) * 0.3).astype(np.float32)
    base = np.asarray(fused_raw_dit.fused_features_raw_dit(
        jnp.asarray(x), cfg, interpret=True))
    pm = np.asarray(fused_raw_dit.fused_features_raw_dit(
        jnp.asarray(x), cfg, merged=True, pm_out=True, half=True,
        interpret=True))
    np.testing.assert_allclose(pm, base, atol=2e-5)


def test_raw_dit_kernel_merged_pm_out_bit_identical(rng):
    """pm_out (wrapper-side phase deinterleave) is a pure relayout —
    outputs must be BIT-identical to the in-kernel transpose."""
    x = (rng.standard_normal((2, 16000)) * 0.3).astype(np.float32)
    m = np.asarray(fused_raw_dit.fused_features_raw_dit(
        jnp.asarray(x), CFG, merged=True, interpret=True))
    pm = np.asarray(fused_raw_dit.fused_features_raw_dit(
        jnp.asarray(x), CFG, merged=True, pm_out=True, interpret=True))
    assert (m == pm).all()
    pm2 = np.asarray(fused_raw_dit.fused_features_raw_dit(
        jnp.asarray(x), CFG, merged=True, pm_out=True, tile_t=64,
        interpret=True))
    assert (m == pm2).all()


def test_raw_dit_kernel_merged_multi_tile(rng):
    x = (rng.standard_normal((2, 16000)) * 0.3).astype(np.float32)
    got = np.asarray(fused_raw_dit.fused_features_raw_dit(
        jnp.asarray(x), CFG, tile_t=64, merged=True, interpret=True))
    assert got.shape == (2, 98, 13)
    for b in range(2):
        want = oracle.mfcc(x[b].astype(np.float64), CFG)
        np.testing.assert_allclose(got[b], want, atol=ATOL)


def test_raw_dit_kernel_logmel_mode(rng):
    # The DIT twiddle combine adds one f32 rounding stage over v3's
    # single-GEMM accumulation, so v4's log-mel valley floor is ~2x
    # v3's: measured 1.03e-4 at a 60 dB window (v3: 1.5e-5), 5.3e-5 at
    # 50 dB.  The backend therefore keeps v3 for log-mel outputs (valley-
    # sensitive) and uses v4 only for cepstral outputs (DCT-projected,
    # ~8e-6).  This test pins v4's own envelope at the 50 dB window.
    cfg = FeatureConfig(n_mels=80, n_mfcc=80,
                        dynamic_range_db=50.0).validate()
    x = (rng.standard_normal((2, 8000)) * 0.3).astype(np.float32)
    got = np.asarray(fused_raw_dit.fused_features_raw_dit(
        jnp.asarray(x), cfg, apply_dct=False, interpret=True))
    assert got.shape == (2, cfg.num_frames(8000), 80)
    for b in range(2):
        want = oracle.log_mel(x[b].astype(np.float64), cfg)
        np.testing.assert_allclose(got[b], want, atol=ATOL)


def test_raw_dit_kernel_non_tile_multiple(rng):
    """98 frames with tile 64 (2 tiles + padding); padded frames must not
    leak, and the double-buffered DMA must stay in range at the tail."""
    x = (rng.standard_normal((1, 16000)) * 0.3).astype(np.float32)
    got = np.asarray(fused_raw_dit.fused_features_raw_dit(
        jnp.asarray(x), CFG, tile_t=64, interpret=True))
    want = oracle.mfcc(x[0].astype(np.float64), CFG)
    assert got.shape == (1, 98, 13)
    np.testing.assert_allclose(got[0], want, atol=ATOL)


def test_raw_dit_kernel_multi_batch_multi_tile(rng):
    """Batch x tiles exercises the flattened double-buffer step index."""
    x = (rng.standard_normal((4, 48000)) * 0.3).astype(np.float32)
    got = np.asarray(fused_raw_dit.fused_features_raw_dit(
        jnp.asarray(x), CFG, tile_t=128, interpret=True))
    assert got.shape == (4, 298, 13)
    for b in range(4):
        want = oracle.mfcc(x[b].astype(np.float64), CFG)
        np.testing.assert_allclose(got[b], want, atol=ATOL)


def test_raw_dit_kernel_ineligible_configs():
    # odd hop: parity split is not frame-invariant
    assert not fused_raw_dit.raw_dit_kernel_eligible(
        FeatureConfig(sample_rate=22050))       # hop 220 -> hop/2=110, P=64
    assert not fused_raw_dit.raw_dit_kernel_eligible(
        FeatureConfig(hop_ms=10.0625))          # hop 161 (odd)
    with pytest.raises(ValueError):
        fused_raw_dit.fused_features_raw_dit(
            jnp.zeros((1, 22050), jnp.float32),
            FeatureConfig(sample_rate=22050), interpret=True)


def test_raw_dit_kernel_short_signal():
    x = jnp.zeros((1, 300), jnp.float32)     # < frame_len
    got = fused_raw_dit.fused_features_raw_dit(x, CFG, interpret=True)
    assert got.shape == (1, 0, 13)
