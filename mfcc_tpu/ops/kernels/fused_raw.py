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
      VPU   reshape rows -> periods: (nper*rpp, LANE) -> (nper, rpp*LANE)
            == every frame of phase p is lanes [p*hop, p*hop+frame_len)
            of one period row (crossing into the next row for at most
            the last `tail` lanes)
      MXU   per phase p: S_p = row-slice @ [cos | sin]  (K = frame_len,
            N = 2*(n_bins-1) lanes exact; split-bin Nyquist as a VPU
            rank-1 rowsum).  Boundary-crossing phases run as TWO sliced
            GEMMs against sliced basis rows (Mosaic can't lane-concat
            mismatched sublane offsets; after lane padding the split
            costs the same MACs)
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
    merged: bool      # one (P*fpp, frame_len) GEMM vs P small ones


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


def _plan(cfg: FeatureConfig, tile_t: int | None, apply_dct: bool,
          merged: bool = False):
    P = LANE // math.gcd(cfg.hop_len, LANE)
    rpp = cfg.hop_len * P // LANE
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
        # energy substitution is a CEPSTRAL-output feature (c0 slot): the
        # XLA reference gates on apply_dct, so log-mel outputs must not
        # overwrite mel band 0 (r4 review finding)
        append_energy=cfg.append_energy and apply_dct, preemph=cfg.preemph,
        log_floor=cfg.log_floor,
        rel_floor=(0.0 if cfg.dynamic_range_db is None
                   else 10.0 ** (-cfg.dynamic_range_db / 10.0)),
        precision=cfg.matmul_precision, merged=merged)


def _kernel(*refs, plan: _PlanRaw, frame_len: int, hop: int):
    # refs = (audio_hbm, basis, mlo, mhi, dctm, chiW_0..chiW_{P-1},
    #         chiN_p for crossing p, out_ref, buf, sem).  chiW_p / chiN_p
    #         are (1, rpp*LANE) zero-padded full rows: Mosaic broadcasts
    #         only offset-0 full reads (lane-offset slices of chi fail
    #         layout assignment), so the per-phase Nyquist rows are
    #         prebuilt host-side in frame-aligned lane positions.
    audio_hbm, basis, mlo, mhi, dctm = refs[:5]
    n_cross = sum(1 for p in range(plan.P)
                  if p * hop + frame_len > plan.rpp * LANE)
    chiw = refs[5: 5 + plan.P]
    chin = refs[5 + plan.P: 5 + plan.P + n_cross]
    out_ref, buf, sem = refs[5 + plan.P + n_cross:]
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
    W = Z[:fpp]                 # period rows (fpp, rpp*LANE)
    Wn = Z[1: 1 + fpp] if plan.tail > 0 else None   # +1-row lookahead
    row_lanes = rpp * LANE

    # ---- per-phase: packed DFT GEMM + split-bin Nyquist + mel + DCT ----
    # Frames whose lane span crosses the period-row boundary are computed
    # as TWO sliced GEMMs against sliced basis rows (Mosaic cannot
    # concatenate vectors with mismatched sublane offsets, and after lane
    # padding the split costs the same MACs as one padded GEMM).
    nb = plan.bins_lo
    bas = basis[:]

    # merged path: one (P*fpp, frame_len) GEMM via VMEM roll+select
    # frame-block assembly (same lever as fused_raw_dit v5; measured
    # there +5% — here it also collapses the P rank-1 Nyquist rowsums
    # into one masked multiply because frames are materialized).
    if plan.merged and P > 1 and frame_len <= row_lanes:
        from .fused_raw_dit import _assemble_phases
        F = _assemble_phases(W, Wn, frame_len, hop, P, row_lanes)
        S = jnp.dot(F, bas, preferred_element_type=jnp.float32,
                    precision=prec)                   # (P*fpp, 2*nb)
        # chiw[0] holds the Nyquist chi column at lanes [0, frame_len)
        # (phase 0 starts at lane 0), so it doubles as the frame-aligned
        # chi row for the materialized frames.
        s_hi = jnp.sum(F * chiw[0][:, :frame_len], axis=1, keepdims=True)
        re, im = S[:, :nb], S[:, nb:]
        p_lo = re * re + im * im
        e = (jnp.dot(p_lo, mlo[:], preferred_element_type=jnp.float32,
                     precision=prec)
             + (s_hi * s_hi) * mhi[0:1, :])
        if plan.rel_floor > 0.0:
            rel = jnp.max(e, axis=1, keepdims=True) * plan.rel_floor
            e = jnp.maximum(e, rel)
        logmel = _acc_log(jnp.maximum(e, plan.log_floor))
        f = (jnp.dot(logmel, dctm[:], preferred_element_type=jnp.float32,
                     precision=prec)
             if plan.apply_dct else logmel)
        if plan.append_energy:
            en = jnp.sum(F * F, axis=1, keepdims=True)
            loge = _acc_log(jnp.maximum(en, plan.log_floor))
            col = jax.lax.broadcasted_iota(jnp.int32, f.shape, 1)
            f = jnp.where(col == 0, loge, f)
        feat = (f.reshape(P, fpp, plan.out_pad).transpose(1, 0, 2)
                 .reshape(plan.tile_t, plan.out_pad))
        out_ref[0, :, :] = feat
        return

    feats = []
    energies_p = []
    cross_i = 0
    for p in range(P):
        lo = p * hop
        hi = lo + frame_len
        if hi <= row_lanes:
            M = W[:, lo:hi]                           # (fpp, frame_len)
            S = jnp.dot(M, bas, preferred_element_type=jnp.float32,
                        precision=prec)               # (fpp, 2*nb)
            s_hi = jnp.sum(W * chiw[p][:], axis=1, keepdims=True)
            en = (jnp.sum(M * M, axis=1, keepdims=True)
                  if plan.append_energy else None)
        else:
            k1 = row_lanes - lo
            A = W[:, lo:row_lanes]                    # (fpp, k1)
            Bp = Wn[:, : hi - row_lanes]              # (fpp, frame_len-k1)
            S = (jnp.dot(A, bas[:k1], preferred_element_type=jnp.float32,
                         precision=prec)
                 + jnp.dot(Bp, bas[k1:], preferred_element_type=jnp.float32,
                           precision=prec))
            s_hi = (jnp.sum(W * chiw[p][:], axis=1, keepdims=True)
                    + jnp.sum(Wn * chin[cross_i][:], axis=1, keepdims=True))
            cross_i += 1
            en = ((jnp.sum(A * A, axis=1, keepdims=True)
                   + jnp.sum(Bp * Bp, axis=1, keepdims=True))
                  if plan.append_energy else None)
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
    n_fft=512).  The real Nyquist column (rank-1, VPU) ships as P
    zero-padded (1, rpp*LANE) rows with the chi values in each phase's
    frame-aligned lane positions (+ a next-row part for boundary-crossing
    phases): Mosaic only broadcasts offset-0 full reads."""
    cos_m, sin_m = spectrum_op.dft_matrices(cfg)     # (frame_len, n_bins)
    nb = cfg.n_bins - 1
    basis = np.concatenate([cos_m[:, :nb], sin_m[:, :nb]],
                           axis=1).astype(np.float32)
    chi = cos_m[:, nb].astype(np.float32)            # (frame_len,)
    P = LANE // math.gcd(cfg.hop_len, LANE)
    row_lanes = cfg.hop_len * P // LANE * LANE
    fl, hop = cfg.frame_len, cfg.hop_len
    chiw, chin = [], []
    for p in range(P):
        lo, hi = p * hop, p * hop + fl
        w = np.zeros((1, row_lanes), np.float32)
        k1 = min(hi, row_lanes) - lo
        w[0, lo: lo + k1] = chi[:k1]
        chiw.append(w)
        if hi > row_lanes:
            nx = np.zeros((1, row_lanes), np.float32)
            nx[0, : hi - row_lanes] = chi[k1:]
            chin.append(nx)
    mel = mel_op.mel_matrix(cfg)                     # (n_bins, n_mels) f64
    mlo = np.zeros((nb, mels_pad), np.float32)
    mlo[:, : cfg.n_mels] = mel[:nb]
    mhi = np.zeros((1, mels_pad), np.float32)
    mhi[0, : cfg.n_mels] = mel[nb]
    d = np.zeros((mels_pad, out_pad), np.float32)
    if apply_dct:
        d[: cfg.n_mels, : cfg.n_mfcc] = dct_op.dct_matrix(cfg)
    return basis, tuple(chiw), tuple(chin), mlo, mhi, d


def fused_features_raw(x: jnp.ndarray, cfg: FeatureConfig, *,
                       apply_dct: bool = True,
                       tile_t: int | None = None,
                       merged: bool = False,
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
    if tile_t is None:
        # adaptive: one grid step for a typical (<= ~10 s) utterance, the
        # smallest phase-aligned tile for short ones.  Tile sweep on v5e
        # (scan protocol, batch 64 x 10 s): 1024 -> 364.9k, 512 -> 356.9k,
        # 256 -> 342.5k audio-sec/s/chip.
        P = LANE // math.gcd(cfg.hop_len, LANE)
        tile_t = min(1024, _round_up(T, 8 * P))
    plan = _plan(cfg, tile_t, apply_dct, merged=merged)
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

    basis, chiw, chin, mlo, mhi, d = _matrices(cfg, plan.mels_pad,
                                               plan.out_pad, apply_dct)

    vmem_const = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_const = 4 + len(chiw) + len(chin)
    out = pl.pallas_call(
        functools.partial(_kernel, plan=plan, frame_len=cfg.frame_len,
                          hop=hop),
        grid=(B, tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]   # raw rows in HBM
        + [vmem_const] * n_const,
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
    )(raw, jnp.asarray(basis), jnp.asarray(mlo), jnp.asarray(mhi),
      jnp.asarray(d), *[jnp.asarray(c) for c in chiw],
      *[jnp.asarray(c) for c in chin])

    return out[:, :T, :n_out]
