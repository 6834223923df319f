"""Fused Pallas TPU kernel: pre-emphasized audio -> MFCC / log-mel.

One kernel, one HBM read of the audio, one HBM write of the features.
Everything between — hop-block DFT GEMMs, |X|^2, mel projection, accurate
log, DCT-II — happens on-chip with all constant matrices resident in VMEM:

    grid = (B, T_tiles); per step:
      DMA   audio hop-blocks (TILE_T + q, hop) HBM -> VMEM scratch
      MXU   re/im = sum_k V_k @ C_k / S_k     (hop-block DFT, f32)
      VPU   power = re^2 + im^2
      MXU   E = power @ MEL                    (padded to lanes of 128)
      VPU   logmel = accurate_log(max(E, floor))   (exponent-bit log)
      MXU   feat = logmel @ DCT                (skipped in log-mel mode)
      VPU   optional energy substitution into c0

The hop-block decomposition (see ops/spectrum.py::power_spectrum_blocked)
is what makes the kernel gather-free: overlapping frames become static
sublane slices of one contiguous scratch buffer.  Zero-padding of matrix
columns makes every matmul land on (8,128)/(128,128)-aligned tiles; padded
lanes compute zeros and are sliced off by the wrapper.

Numerical contract is identical to the jnp path (f32 accumulate, same log):
parity is pinned by tests/test_kernels.py in interpret mode and by the
TPU drive in bench/verify.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import FeatureConfig
from .. import spectrum as spectrum_op, mel as mel_op, dct as dct_op
from ..xmath import _LN2, _SQRT2

DEF_TILE_T = 128
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _acc_log(x):
    """accurate_log inlined for the kernel (see ops/xmath.py)."""
    bits = x.view(jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    m = jnp.bitwise_or(
        jnp.bitwise_and(bits, jnp.int32(0x007FFFFF)), jnp.int32(0x3F800000)
    ).view(jnp.float32)
    big = m >= _SQRT2
    m = jnp.where(big, m * 0.5, m)
    e = (e + big.astype(jnp.int32)).astype(jnp.float32)
    r = (m - 1.0) / (m + 1.0)
    r2 = r * r
    p = 2.0 / 9.0
    p = p * r2 + 2.0 / 7.0
    p = p * r2 + 2.0 / 5.0
    p = p * r2 + 2.0 / 3.0
    p = p * r2 + 2.0
    return e * _LN2 + r * p


class _Plan(NamedTuple):
    """Static geometry shared by wrapper and kernel."""
    q: int            # full hop blocks per frame
    r: int            # partial tail samples (frame_len % hop)
    hop: int          # true hop (valid lanes per block row)
    hop_pad: int      # hop rounded up to LANE (block row lane count)
    tile_t: int
    bins_pad: int     # n_bins rounded up to LANE
    mels_pad: int
    out_pad: int      # output feature lanes
    apply_dct: bool
    append_energy: bool
    log_floor: float
    rel_floor: float  # 10^(-dynamic_range_db/10); 0.0 disables
    precision: str    # "default" | "high" | "highest" (MXU pass count)


# extra scratch rows beyond the tile: Mosaic requires 8-aligned DMA slice
# shapes and 8-aligned sublane slice offsets, so the k-row shifts below go
# through pltpu.roll instead of offset slicing.
Q_PAD = 8


def _kernel(audio_hbm, cosm, sinm, melm, dctm, out_ref, scratch, sem, *,
            plan: _Plan):
    b = pl.program_id(0)
    t = pl.program_id(1)
    tile, q, r = plan.tile_t, plan.q, plan.r
    hp = plan.hop_pad
    prec = {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[plan.precision]
    n_blocks = q + (1 if r > 0 else 0)   # uniform: matrices are row-padded

    # ---- DMA: hop-block rows [t*tile, t*tile + tile + Q_PAD) of utt b ----
    cp = pltpu.make_async_copy(
        audio_hbm.at[b, pl.ds(t * tile, tile + Q_PAD), :], scratch, sem)
    cp.start()
    cp.wait()

    # ---- hop-block DFT (MXU); row shift k via sublane roll ----
    buf = scratch[:]
    rows = tile + Q_PAD
    re = jnp.zeros((tile, plan.bins_pad), jnp.float32)
    im = jnp.zeros((tile, plan.bins_pad), jnp.float32)
    for k in range(n_blocks):
        # roll by rows-k == roll by -k (pltpu.roll wants shift >= 0)
        vk = buf if k == 0 else pltpu.roll(buf, shift=rows - k, axis=0)
        v = vk[:tile, :]
        c_k = cosm[k * hp: (k + 1) * hp, :]
        s_k = sinm[k * hp: (k + 1) * hp, :]
        # explicit precision: Mosaic's default f32 matmul is a single
        # bf16 MXU pass (~2^-8 relative) — uniform ~1e-2 log-domain error
        re = re + jnp.dot(v, c_k, preferred_element_type=jnp.float32,
                          precision=prec)
        im = im + jnp.dot(v, s_k, preferred_element_type=jnp.float32,
                          precision=prec)

    power = re * re + im * im

    # ---- mel + log (MXU + VPU) ----
    energies = jnp.dot(power, melm[:], preferred_element_type=jnp.float32,
                       precision=prec)
    if plan.rel_floor > 0.0:
        # padded mel lanes are exact zeros and never win the max
        rel = jnp.max(energies, axis=1, keepdims=True) * plan.rel_floor
        energies = jnp.maximum(energies, rel)
    logmel = _acc_log(jnp.maximum(energies, plan.log_floor))

    # ---- DCT (MXU) ----
    feat = (jnp.dot(logmel, dctm[:], preferred_element_type=jnp.float32,
                    precision=prec)
            if plan.apply_dct else logmel)

    if plan.append_energy:
        sq = buf * buf
        row_full = jnp.sum(sq, axis=1, keepdims=True)       # (rows, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, sq.shape, 1)
        row_part = jnp.sum(jnp.where(lane < r, sq, 0.0), axis=1,
                           keepdims=True) if r > 0 else None
        e = jnp.zeros((tile, 1), jnp.float32)
        for k in range(q):
            rk = (row_full if k == 0
                  else pltpu.roll(row_full, shift=rows - k, axis=0))
            e = e + rk[:tile, :]
        if r > 0:
            rp = (pltpu.roll(row_part, shift=rows - q, axis=0)
                  if q else row_part)
            e = e + rp[:tile, :]
        loge = _acc_log(jnp.maximum(e, plan.log_floor))
        col = jax.lax.broadcasted_iota(jnp.int32, feat.shape, 1)
        feat = jnp.where(col == 0, loge, feat)

    out_ref[0, :, :] = feat


@functools.lru_cache(maxsize=16)
def _matrices(cfg: FeatureConfig, bins_pad: int, mels_pad: int, out_pad: int,
              apply_dct: bool):
    """Zero-padded f32 constants (built float64 by the oracle layer).

    DFT matrices are laid out per hop block with each block's rows padded
    from hop to hop_pad (lane-aligned): block k's valid rows hold DFT rows
    [k*hop, k*hop + valid_k) and the padding rows are zero, matching the
    lane-padded audio blocks — zeros contribute nothing, so the kernel's
    block loop is uniform with no lane slicing anywhere."""
    cos_m, sin_m = spectrum_op.dft_matrices(cfg)        # (frame_len, n_bins)
    fl = cfg.frame_len
    hop = cfg.hop_len
    hop_pad = _round_up(hop, LANE)
    q, r = divmod(fl, hop)
    n_blocks = q + (1 if r else 0)
    c = np.zeros((n_blocks * hop_pad, bins_pad), np.float32)
    s = np.zeros((n_blocks * hop_pad, bins_pad), np.float32)
    for k in range(n_blocks):
        valid = hop if k < q else r
        c[k * hop_pad: k * hop_pad + valid, : cfg.n_bins] = (
            cos_m[k * hop: k * hop + valid])
        s[k * hop_pad: k * hop_pad + valid, : cfg.n_bins] = (
            sin_m[k * hop: k * hop + valid])
    m = np.zeros((bins_pad, mels_pad), np.float32)
    m[: cfg.n_bins, : cfg.n_mels] = mel_op.mel_matrix(cfg)
    if apply_dct:
        d = np.zeros((mels_pad, out_pad), np.float32)
        d[: cfg.n_mels, : cfg.n_mfcc] = dct_op.dct_matrix(cfg)
    else:
        d = np.zeros((mels_pad, out_pad), np.float32)   # unused placeholder
    return c, s, m, d


def fused_features(y: jnp.ndarray, cfg: FeatureConfig, *,
                   apply_dct: bool = True,
                   tile_t: int = DEF_TILE_T,
                   interpret: bool = False) -> jnp.ndarray:
    """(B, N) PRE-EMPHASIZED audio -> (B, T, n_out) features.

    n_out = n_mfcc (apply_dct) or n_mels.  N must be >= frame_len; audio is
    internally zero-padded on the time axis to tile geometry (padded output
    frames are computed-on-zeros and sliced off).
    """
    assert y.ndim == 2, "batch input (B, N) expected"
    B, N = y.shape
    hop = cfg.hop_len
    q, r = divmod(cfg.frame_len, hop)
    if q + (1 if r else 0) - 1 > Q_PAD:
        raise ValueError(
            f"frame_len/hop ratio too large for the fused kernel "
            f"(needs {q + (1 if r else 0) - 1} shift rows > Q_PAD={Q_PAD}); "
            "use the XLA path")
    T = cfg.num_frames(N)
    if T <= 0:
        n_out = cfg.n_mfcc if apply_dct else cfg.n_mels
        return jnp.zeros((B, 0, n_out), jnp.float32)

    tiles = _round_up(T, tile_t) // tile_t
    rows_needed = tiles * tile_t + Q_PAD
    n_padded = rows_needed * hop
    if n_padded > N:
        y = jnp.pad(y, ((0, 0), (0, n_padded - N)))
    blocks = y[:, : n_padded].reshape(B, rows_needed, hop).astype(jnp.float32)
    # Mosaic DMA slices must be lane-aligned: pad each hop row to hop_pad
    # lanes (the DFT matrices are row-padded to match, see _matrices)
    hop_pad = _round_up(hop, LANE)
    if hop_pad > hop:
        blocks = jnp.pad(blocks, ((0, 0), (0, 0), (0, hop_pad - hop)))

    bins_pad = _round_up(cfg.n_bins, LANE)
    mels_pad = _round_up(cfg.n_mels, LANE)
    out_pad = _round_up(cfg.n_mfcc, LANE) if apply_dct else mels_pad
    c, s, m, d = _matrices(cfg, bins_pad, mels_pad, out_pad, apply_dct)

    plan = _Plan(q=q, r=r, hop=hop, hop_pad=hop_pad, tile_t=tile_t,
                 bins_pad=bins_pad, mels_pad=mels_pad, out_pad=out_pad,
                 apply_dct=apply_dct,
                 # gate on apply_dct: c0 substitution is cepstral-only
                 append_energy=cfg.append_energy and apply_dct,
                 log_floor=cfg.log_floor,
                 rel_floor=(0.0 if cfg.dynamic_range_db is None
                            else 10.0 ** (-cfg.dynamic_range_db / 10.0)),
                 precision=cfg.matmul_precision)

    vmem_const = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, plan=plan),
        grid=(B, tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # audio blocks in HBM
            vmem_const, vmem_const, vmem_const, vmem_const,
        ],
        out_specs=pl.BlockSpec(
            (1, tile_t, out_pad), lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, tiles * tile_t, out_pad),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_t + Q_PAD, hop_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * tiles * tile_t
            * (cfg.frame_len * bins_pad * 2 + bins_pad * mels_pad
               + (mels_pad * out_pad if apply_dct else 0)),
            bytes_accessed=B * (n_padded + tiles * tile_t * out_pad) * 4,
            transcendentals=B * tiles * tile_t * mels_pad,
        ),
    )(blocks, jnp.asarray(c), jnp.asarray(s), jnp.asarray(m), jnp.asarray(d))

    n_out = cfg.n_mfcc if apply_dct else cfg.n_mels
    return out[:, :T, :n_out]
