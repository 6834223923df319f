"""Fused Pallas TPU kernel v3: RAW audio -> MFCC / log-mel, zero prep.

Why a third kernel: the scan-protocol ablation (bench/kernel_probe.py,
r2) showed the XLA-side prep of the DIT kernel — pre-emphasis, parity
deinterleave, zero-pad, hop-block reshape, 80->128 lane pad — costs as
much as the kernel itself (~47% of pipeline time; prep-only runs at
714k audio-sec/s vs 333k full).  XLA materializes each of those layout
ops through HBM at well under peak bandwidth.  This kernel consumes the
raw (B, N) signal directly; the wrapper's only XLA op is ONE fused
zero-pad (and that only when N isn't already tile-aligned).

The layout trick that makes frames row-aligned without any prep:
let g = gcd(hop, LANE) and P = LANE/g.  Frame starts hit only P distinct
lane offsets (p*hop mod LANE), repeating every P frames = hop*P/LANE
raw rows ("one period").  So per grid step:

      DMA   (8 + rows_span, LANE) raw rows HBM -> VMEM (double-buffered;
            8 lead rows carry the pre-emphasis predecessor across steps)
      VPU   pre-emphasis in-register: z[n] = x[n] - a*x[n-1] via one
            lane-roll + one sublane-roll for the row boundary
      VPU   reshape rows -> periods: (nper*rpp, LANE) -> (nper, rpp*LANE),
            lane-concat the next period row -> W (nper, rpp*LANE + tail)
            == every frame of phase p is W[k, p*hop : p*hop + frame_len]
      MXU   per phase p: S_p = W-slice @ [cos | sin]   (K = frame_len,
            N = 2*(n_bins-1) lanes exact; split-bin Nyquist as a VPU
            rank-1 rowsum)
      VPU   |X|^2, mel (MXU), accurate log, DCT (MXU) per phase
      VPU   interleave the P phase results -> natural frame order
      DMA   out tile write

MACs/frame are the direct form's (~2x the DIT kernel's) — but the DIT
kernel was never MXU-bound (tile/roll/log ablations all measured ~0
cost); trading MXU headroom to delete the prep wins overall
(bench/ab_backend.json r2 refresh).

Numerical contract: identical stages to the jnp XLA path (f32, HIGHEST,
same accurate log, signal-convention pre-emphasis with x[-1] := x[0]).
Parity pinned in tests/test_kernels.py (interpret mode) and on hardware
by the bench accuracy gate.

Reference analog: SURVEY.md §2b maps the reference's codegen stage to
this kernel family (/root/reference/src/mfcc/codegen.c:40-59); the
reference emits one hardcoded target, this backend registry earns its
entries by measurement (bench/ab_backend.py).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import FeatureConfig
from .. import spectrum as spectrum_op, mel as mel_op, dct as dct_op
from .fused_mfcc import _acc_log, _round_up, LANE

LEAD = 8   # sublane-aligned lead rows carrying the preemph predecessor


class _PlanRaw(NamedTuple):
    P: int            # frames per lane-phase period
    rpp: int          # raw rows per period (hop*P/LANE)
    nper: int         # periods per tile (+1 lookahead) = tile//P + 1
    tail: int         # extra lanes needed past a period row
    rows_span: int    # DMA rows per step (excl. LEAD)
    tile_t: int
    fpp: int          # frames per phase per tile (tile // P)
    bins_lo: int      # n_bins - 1 (packed GEMM bins)
    mels_pad: int
    out_pad: int
    apply_dct: bool
    append_energy: bool
    preemph: float
    log_floor: float
    rel_floor: float
    precision: str


def raw_kernel_eligible(cfg: FeatureConfig) -> bool:
    """Needs an even n_fft (real Nyquist column), a hop whose lane-phase
    period is small (gcd(hop, 128) >= 16 -> at most 8 phase GEMMs), and a
    frame that fits within one period row plus its lookahead."""
    if cfg.n_fft % 2 != 0 or cfg.frame_len < 1:
        return False
    P = LANE // math.gcd(cfg.hop_len, LANE)
    if P > 8:
        return False
    rpp = cfg.hop_len * P // LANE
    tail = (P - 1) * cfg.hop_len + cfg.frame_len - rpp * LANE
    return tail <= rpp * LANE


def _plan(cfg: FeatureConfig, tile_t: int | None, apply_dct: bool):
    P = LANE // math.gcd(cfg.hop_len, LANE)
    rpp = cfg.hop_len * P // LANE
    if tile_t is None:
        tile_t = 128 * P
    assert tile_t % (8 * P) == 0, "tile must be a multiple of 8 phases"
    fpp = tile_t // P
    nper = fpp + 1
    tail = max((P - 1) * cfg.hop_len + cfg.frame_len - rpp * LANE, 0)
    rows_span = _round_up(nper * rpp, 8)
    mels_pad = _round_up(cfg.n_mels, LANE)
    out_pad = _round_up(cfg.n_mfcc, LANE) if apply_dct else mels_pad
    return _PlanRaw(
        P=P, rpp=rpp, nper=nper, tail=tail, rows_span=rows_span,
        tile_t=tile_t, fpp=fpp, bins_lo=cfg.n_bins - 1, mels_pad=mels_pad,
        out_pad=out_pad, apply_dct=apply_dct,
        append_energy=cfg.append_energy, preemph=cfg.preemph,
        log_floor=cfg.log_floor,
        rel_floor=(0.0 if cfg.dynamic_range_db is None
                   else 10.0 ** (-cfg.dynamic_range_db / 10.0)),
        precision=cfg.matmul_precision)


def _kernel(audio_hbm, basis, chi, mlo, mhi, dctm, out_ref, buf, sem, *,
            plan: _PlanRaw, frame_len: int, hop: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    prec = {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[plan.precision]
    span = LEAD + plan.rows_span
    rows_per_tile = plan.tile_t * hop // LANE

    # ---- double-buffered DMA of raw rows ----
    step = b * n_tiles + t
    slot = jax.lax.rem(step, 2)

    def dma(bi, ti, sl):
        return pltpu.make_async_copy(
            audio_hbm.at[bi, pl.ds(ti * rows_per_tile, span), :],
            buf.at[sl], sem.at[sl])

    @pl.when(step == 0)
    def _():
        dma(b, t, slot).start()

    nstep = step + 1
    nb_, nt_ = nstep // n_tiles, jax.lax.rem(nstep, n_tiles)

    @pl.when(nstep < pl.num_programs(0) * n_tiles)
    def _():
        dma(nb_, nt_, 1 - slot).start()

    dma(b, t, slot).wait()
    x = buf[slot]                                     # (span, LANE)

    # ---- pre-emphasis in-register (signal convention) ----
    if plan.preemph > 0.0:
        pr = pltpu.roll(x, shift=1, axis=1)           # lane j-1 (lane 0 bad)
        prf = pltpu.roll(pr, shift=1, axis=0)         # row i-1's lane 127
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        pred = jnp.where(lane == 0, prf, pr)
        # x[-1] := x[0] at the true signal start (t == 0: the LEAD rows
        # are wrapper zeros, the signal starts at local (LEAD, 0))
        pred = jnp.where((t == 0) & (row == LEAD) & (lane == 0), x, pred)
        z = x - jnp.float32(plan.preemph) * pred
    else:
        z = x

    # ---- rows -> periods; frames become static lane slices ----
    nper, rpp, P, fpp = plan.nper, plan.rpp, plan.P, plan.fpp
    Z = z[LEAD: LEAD + nper * rpp, :].reshape(nper, rpp * LANE)
    if plan.tail > 0:
        Znext = pltpu.roll(Z, shift=nper - 1, axis=0)  # roll by -1 row
        W = jnp.concatenate([Z, Znext[:, : plan.tail]], axis=1)
    else:
        W = Z

    # ---- per-phase: packed DFT GEMM + split-bin Nyquist + mel + DCT ----
    nb = plan.bins_lo
    feats = []
    energies_p = []
    for p in range(P):
        M = W[:fpp, p * hop: p * hop + frame_len]     # (fpp, frame_len)
        S = jnp.dot(M, basis[:], preferred_element_type=jnp.float32,
                    precision=prec)                   # (fpp, 2*nb)
        s_hi = jnp.sum(M * chi[0:1, :], axis=1, keepdims=True)
        re, im = S[:, :nb], S[:, nb:]
        p_lo = re * re + im * im
        p_hi = s_hi * s_hi
        e = (jnp.dot(p_lo, mlo[:], preferred_element_type=jnp.float32,
                     precision=prec)
             + p_hi * mhi[0:1, :])
        if plan.rel_floor > 0.0:
            rel = jnp.max(e, axis=1, keepdims=True) * plan.rel_floor
            e = jnp.maximum(e, rel)
        logmel = _acc_log(jnp.maximum(e, plan.log_floor))
        f = (jnp.dot(logmel, dctm[:], preferred_element_type=jnp.float32,
                     precision=prec)
             if plan.apply_dct else logmel)
        if plan.append_energy:
            en = jnp.sum(M * M, axis=1, keepdims=True)
            energies_p.append(_acc_log(jnp.maximum(en, plan.log_floor)))
        feats.append(f)

    # ---- interleave phases back to natural frame order ----
    if P == 1:
        feat = feats[0]
    else:
        feat = jnp.stack(feats, axis=1).reshape(plan.tile_t, plan.out_pad)
    if plan.append_energy:
        loge = (energies_p[0] if P == 1
                else jnp.stack(energies_p, axis=1).reshape(plan.tile_t, 1))
        col = jax.lax.broadcasted_iota(jnp.int32, feat.shape, 1)
        feat = jnp.where(col == 0, loge, feat)

    out_ref[0, :, :] = feat


@functools.lru_cache(maxsize=16)
def _matrices(cfg: FeatureConfig, mels_pad: int, out_pad: int,
              apply_dct: bool):
    """Float32 VMEM constants (float64 oracle-layer math).  Basis packs
    [cos | sin] for bins 0..n_bins-2 (2*(n_bins-1) lanes, exact for
    n_fft=512); chi is the real Nyquist column (rank-1, VPU)."""
    cos_m, sin_m = spectrum_op.dft_matrices(cfg)     # (frame_len, n_bins)
    nb = cfg.n_bins - 1
    basis = np.concatenate([cos_m[:, :nb], sin_m[:, :nb]],
                           axis=1).astype(np.float32)
    chi = cos_m[:, nb:].astype(np.float32).T         # (1, frame_len)
    mel = mel_op.mel_matrix(cfg)                     # (n_bins, n_mels) f64
    mlo = np.zeros((nb, mels_pad), np.float32)
    mlo[:, : cfg.n_mels] = mel[:nb]
    mhi = np.zeros((1, mels_pad), np.float32)
    mhi[0, : cfg.n_mels] = mel[nb]
    d = np.zeros((mels_pad, out_pad), np.float32)
    if apply_dct:
        d[: cfg.n_mels, : cfg.n_mfcc] = dct_op.dct_matrix(cfg)
    return basis, chi, mlo, mhi, d


def fused_features_raw(x: jnp.ndarray, cfg: FeatureConfig, *,
                       apply_dct: bool = True,
                       tile_t: int | None = None,
                       interpret: bool = False) -> jnp.ndarray:
    """(B, N) RAW audio (dither already applied if any) -> (B, T, n_out).

    Pre-emphasis happens inside the kernel.  The wrapper's only XLA work
    is a single fused zero-pad: LEAD*LANE leading zeros (pre-emphasis
    predecessor convention) plus tail padding to tile geometry.
    """
    assert x.ndim == 2, "batch input (B, N) expected"
    if not raw_kernel_eligible(cfg):
        raise ValueError("config not eligible for the raw kernel")
    B, N = x.shape
    T = cfg.num_frames(N)
    n_out = cfg.n_mfcc if apply_dct else cfg.n_mels
    if T <= 0:
        return jnp.zeros((B, 0, n_out), jnp.float32)
    plan = _plan(cfg, tile_t, apply_dct)
    hop = cfg.hop_len

    tiles = _round_up(T, plan.tile_t) // plan.tile_t
    rows_per_tile = plan.tile_t * hop // LANE
    rows_total = (tiles - 1) * rows_per_tile + LEAD + plan.rows_span
    n_padded = rows_total * LANE
    # rows_span*LANE >= tile*hop + frame_len by construction, so the tail
    # pad is never negative
    tail_pad = n_padded - LEAD * LANE - N
    assert tail_pad >= 0, (n_padded, N)
    x = jnp.pad(x.astype(jnp.float32), ((0, 0), (LEAD * LANE, tail_pad)))
    raw = x.reshape(B, rows_total, LANE)

    basis, chi, mlo, mhi, d = _matrices(cfg, plan.mels_pad, plan.out_pad,
                                        apply_dct)

    vmem_const = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, plan=plan, frame_len=cfg.frame_len,
                          hop=hop),
        grid=(B, tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # raw rows in HBM
            vmem_const, vmem_const, vmem_const, vmem_const, vmem_const,
        ],
        out_specs=pl.BlockSpec(
            (1, plan.tile_t, plan.out_pad), lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, tiles * plan.tile_t,
                                        plan.out_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, LEAD + plan.rows_span, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * tiles * plan.tile_t
            * (_round_up(cfg.frame_len, LANE) * 2 * plan.bins_lo
               + plan.bins_lo * plan.mels_pad
               + (plan.mels_pad * plan.out_pad if apply_dct else 0)),
            bytes_accessed=B * (n_padded
                                + tiles * plan.tile_t * plan.out_pad) * 4,
            transcendentals=B * tiles * plan.tile_t * plan.mels_pad,
        ),
    )(raw, jnp.asarray(basis), jnp.asarray(chi), jnp.asarray(mlo),
      jnp.asarray(mhi), jnp.asarray(d))

    return out[:, :T, :n_out]
