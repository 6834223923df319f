"""Fused Pallas TPU kernel for the pitch NCCF stage (VERDICT r3 #1a).

The XLA NCCF path (ops/pitch.nccf) materializes the extended frames
(B, T, n) AND four spectra (B, T, K) in HBM between its five GEMMs —
~140 MB of round-trips for a 64 x 10 s batch whose true input is 10 MB
of work-rate audio.  This kernel is the v3->v5 MFCC playbook applied to
that chain: DMA the raw work-rate rows once, assemble frames in VMEM
(roll+select on the lane-phase-periodic layout — no HBM frame tensor),
and keep every spectrum in VMEM between GEMMs.

Stage structure per tile (shapes for the default PitchConfig:
work_rate 4 kHz, frame 100, hop 40, lags 10..80 -> n = 180, Nc = 180,
K = 91, n_lags = 71):

  DMA   (rows_span, 128) work-rate rows, double-buffered
  VPU   rows -> periods; per-phase cyclic roll+select -> ONE
        (tile_t, Lpad=256) frame block F (phase-major rows)
  MXU   FE = F @ B_full, FA = F @ B_win — each basis packs
        [cos | sin] of the length-Nc real DFT at lanes [0..K) and
        [128..128+K); window masking is FOLDED into B_win's rows (rows
        >= frame_len_w are zero), so no select on F is needed.  Rows of
        both bases beyond n are zero, so the assembly's garbage lanes
        (next-frame signal) never enter any product.
  VPU   correlation theorem without ever slicing an unaligned lane
        block: with G = FA*FE, R = G + roll(G, 128) holds
        Re[conj(DFT A) DFT E] at lanes [0..K); I = roll(FA,128)*FE -
        FA*roll(FE,128) holds Im[.] likewise.  One select + roll packs
        [R | I] back into a 256-lane operand.
  MXU   num = [R|I] @ CL — CL rows [0..K) = idft-cos, rows
        [128..128+K) = -idft-sin, landing the numerator directly on the
        min_lag..max_lag grid (lanes [0..n_lags)).
  MXU   lag-window energies as a GEMM: e_lag = F^2 @ Band, Band col j =
        indicator of samples [min_lag+j, min_lag+j+frame_len_w).
  VPU   e0 by masked lane-reduction; nccf_b = num/sqrt(max(e0*e_lag,
        1e-30) + ballast), nccf_p = num/sqrt(max(.., 1e-30)); the
        per-utterance ballast (ballast * mean_energy^2, a batch-global
        masked mean) is computed by the WRAPPER from one cumsum over the
        10 MB input and enters as a (B, LANE) operand — the only
        cross-frame coupling in the stage.
  VPU   phase-major -> natural frame order, one (tile_t, 256) write:
        lanes [0..n_lags) = ballasted, [128..128+n_lags) = plain.

Numerical contract: identical stage math to ops/pitch.nccf (f32,
HIGHEST, same correlation-theorem factorization, same floors); frames
past the padded signal end differ (XLA clamps the gather to the last
sample, the kernel reads zero rows) — those frames are invalid by
definition and masked by every caller.  Parity pinned in
tests/test_pitch.py (interpret mode).

Reference analog: SURVEY.md §2b maps the reference's codegen stage to
the fused-kernel family (/root/reference/src/mfcc/codegen.c:40-59 — the
reference hand-writes its hot path; same rule here).
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

from ...config import PitchConfig
from .fused_mfcc import _round_up, LANE


class _PlanNccf(NamedTuple):
    P: int            # frames per lane-phase period
    rpp: int          # rows per period (hop*P/LANE)
    nper: int         # periods per tile (+1 lookahead)
    rows_span: int    # DMA rows per grid step
    tile_t: int
    fpp: int          # frames per phase per tile
    n: int            # extended window (frame_len_w + max_lag)
    w: int            # frame_len_w
    Lpad: int         # n rounded up to LANE
    Nc: int           # circular-correlation length (n rounded up to even)
    K: int            # real DFT bins (Nc//2 + 1)
    lo: int           # min_lag
    n_lags: int


def nccf_kernel_eligible(pcfg: PitchConfig) -> bool:
    """Shape constraints of the packed layout: <= 32 lane phases at the
    work rate (the default 4 kHz preset has 16; the Kaldi-exact 2 kHz
    preset 32 — each phase costs one roll+select in the VMEM assembly),
    DFT bins K <= 128 (the [cos|sin] blocks live at lane offsets 0/128),
    lag grid <= 128 lanes, and the padded frame within one period row
    (the roll+select window cannot exceed row_lanes)."""
    hop = pcfg.hop_len_w
    if hop <= 0 or hop > LANE * 8:
        return False
    P = LANE // math.gcd(hop, LANE)
    if P > 32:
        return False
    rpp = hop * P // LANE
    n = pcfg.frame_len_w + pcfg.max_lag
    Nc = n + (n % 2)
    Lpad = _round_up(n, LANE)
    return (Nc // 2 + 1 <= LANE and pcfg.n_lags <= LANE
            and Lpad <= rpp * LANE)


def _plan(pcfg: PitchConfig, tile_t: int) -> _PlanNccf:
    hop = pcfg.hop_len_w
    P = LANE // math.gcd(hop, LANE)
    rpp = hop * P // LANE
    assert tile_t % P == 0 and (tile_t // P) % 8 == 0, \
        "tile must give sublane-aligned frames-per-phase"
    fpp = tile_t // P
    nper = fpp + 1
    n = pcfg.frame_len_w + pcfg.max_lag
    return _PlanNccf(
        P=P, rpp=rpp, nper=nper, rows_span=_round_up(nper * rpp, 8),
        tile_t=tile_t, fpp=fpp, n=n, w=pcfg.frame_len_w,
        Lpad=_round_up(n, LANE), Nc=n + (n % 2), K=(n + (n % 2)) // 2 + 1,
        lo=pcfg.min_lag, n_lags=pcfg.n_lags)


@functools.lru_cache(maxsize=16)
def _matrices(pcfg: PitchConfig):
    """Float32 VMEM constants (float64 construction, matching
    ops/pitch._corr_matrices conventions exactly).

    B_full/B_win (Lpad, 256): col k (k < K) = cos(2 pi j k / Nc),
    col 128+k = sin(2 pi j k / Nc), row j = extended-window sample j;
    B_win additionally zeroes rows >= frame_len_w (the NCCF's windowed
    copy A = E[:w]).  Rows >= n are zero in both (assembly garbage
    lanes).

    CL (256, 128): rows [0..K) = (wk * cos(2 pi k L / Nc)) / Nc, rows
    [128..128+K) = -(wk * sin(..)) / Nc, col L-lo on the lag grid; wk =
    2 except DC/Nyquist.  Band (Lpad, 128): col j = 1 on samples
    [lo+j, lo+j+w)."""
    plan = _plan(pcfg, 8 * (LANE // math.gcd(pcfg.hop_len_w, LANE)))
    n, Nc, K, w, lo, n_lags, Lpad = (plan.n, plan.Nc, plan.K, plan.w,
                                     plan.lo, plan.n_lags, plan.Lpad)
    j = np.arange(n, dtype=np.float64)[:, None]
    k = np.arange(K, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * j * k / Nc
    b_full = np.zeros((Lpad, 2 * LANE), np.float64)
    b_full[:n, :K] = np.cos(ang)
    b_full[:n, LANE: LANE + K] = np.sin(ang)
    b_win = b_full.copy()
    b_win[w:] = 0.0
    wk = np.full((K,), 2.0)
    wk[0] = 1.0
    if Nc % 2 == 0:
        wk[-1] = 1.0
    lags = np.arange(lo, lo + n_lags, dtype=np.float64)
    angL = 2.0 * np.pi * k.T * lags[None, :] / Nc      # (K, n_lags)
    cl = np.zeros((2 * LANE, LANE), np.float64)
    cl[:K, :n_lags] = (wk[:, None] * np.cos(angL)) / Nc
    cl[LANE: LANE + K, :n_lags] = -(wk[:, None] * np.sin(angL)) / Nc
    band = np.zeros((Lpad, LANE), np.float64)
    for jj in range(n_lags):
        band[lo + jj: lo + jj + w, jj] = 1.0
    f32 = np.float32
    return (b_full.astype(f32), b_win.astype(f32), cl.astype(f32),
            band.astype(f32))


def _kernel(xw_hbm, ball_ref, b_full, b_win, cl, band, out_ref, buf, sem,
            *, plan: _PlanNccf, hop: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    span = plan.rows_span
    rows_per_tile = plan.tile_t * hop // LANE

    step = b * n_tiles + t
    slot = jax.lax.rem(step, 2)

    def dma(bi, ti, sl):
        return pltpu.make_async_copy(
            xw_hbm.at[bi, pl.ds(ti * rows_per_tile, span), :],
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

    P, rpp, fpp, Lpad = plan.P, plan.rpp, plan.fpp, plan.Lpad
    row_lanes = rpp * LANE
    Z = buf[slot][: plan.nper * rpp, :].reshape(plan.nper, row_lanes)
    W = Z[:fpp]
    Wn = Z[1: 1 + fpp]

    # ---- VMEM frame assembly: cyclic roll + select per phase (never a
    # lane-dim concat of unaligned slices — Mosaic refuses those) ------
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (fpp, row_lanes), 1)
    rows = []
    for p in range(P):
        off = p * hop
        k1 = row_lanes - off
        wp = pltpu.roll(W, shift=k1, axis=1) if off else W
        if off + Lpad > row_lanes:          # tail from the lookahead row
            wn = pltpu.roll(Wn, shift=k1, axis=1)
            wp = jnp.where(lane_r < k1, wp, wn)
        rows.append(wp[:, :Lpad])
    F = jnp.concatenate(rows, axis=0) if P > 1 else rows[0]

    prec = jax.lax.Precision.HIGHEST
    FE = jnp.dot(F, b_full[:], preferred_element_type=jnp.float32,
                 precision=prec)
    FA = jnp.dot(F, b_win[:], preferred_element_type=jnp.float32,
                 precision=prec)
    # correlation theorem on the packed layout (see module docstring):
    # re_a*re_e + sa*se at lanes [0..K); sa*re_e - re_a*se likewise
    G = FA * FE
    R = G + pltpu.roll(G, shift=LANE, axis=1)
    I = (pltpu.roll(FA, shift=LANE, axis=1) * FE
         - FA * pltpu.roll(FE, shift=LANE, axis=1))
    lane2 = jax.lax.broadcasted_iota(jnp.int32, R.shape, 1)
    numin = jnp.where(lane2 < LANE, R, pltpu.roll(I, shift=LANE, axis=1))
    num = jnp.dot(numin, cl[:], preferred_element_type=jnp.float32,
                  precision=prec)

    E2 = F * F
    e_lag = jnp.dot(E2, band[:], preferred_element_type=jnp.float32,
                    precision=prec)
    laneF = jax.lax.broadcasted_iota(jnp.int32, F.shape, 1)
    e0 = jnp.sum(jnp.where(laneF < plan.w, E2, 0.0), axis=1,
                 keepdims=True)

    ball = ball_ref[0, 0, 0]
    prod = jnp.maximum(e0 * e_lag, 1e-30)
    nccf_b = num / jnp.sqrt(prod + ball)
    nccf_p = num / jnp.sqrt(prod)
    out = jnp.concatenate([nccf_b, nccf_p], axis=1)   # 128-aligned concat

    if P > 1:   # phase-major rows -> natural frame order
        out = (out.reshape(P, fpp, 2 * LANE).transpose(1, 0, 2)
                  .reshape(plan.tile_t, 2 * LANE))
    out_ref[0, :, :] = out


def fused_nccf(xw: jnp.ndarray, ball: jnp.ndarray, pcfg: PitchConfig, *,
               T: int, tile_t: int | None = None,
               interpret: bool = False):
    """(B, Nw) work-rate signal + (B,) ballast (ballast * mean_e^2) ->
    ((B, T, n_lags) ballasted NCCF, (B, T, n_lags) plain NCCF).

    The wrapper's only XLA work is one pad+reshape of the 10 MB input
    and the final lane slices of the packed output."""
    assert xw.ndim == 2
    if not nccf_kernel_eligible(pcfg):
        raise ValueError("config not eligible for the NCCF kernel")
    B, Nw = xw.shape
    n_lags = pcfg.n_lags
    if T <= 0:
        z = jnp.zeros((B, 0, n_lags), jnp.float32)
        return z, z
    hop = pcfg.hop_len_w
    P = LANE // math.gcd(hop, LANE)
    if tile_t is None:
        tile_t = min(1024, _round_up(T, 8 * P))
    plan = _plan(pcfg, tile_t)

    tiles = _round_up(T, plan.tile_t) // plan.tile_t
    rows_per_tile = plan.tile_t * hop // LANE
    rows_total = (tiles - 1) * rows_per_tile + plan.rows_span
    pad = rows_total * LANE - Nw
    assert pad >= 0, (rows_total, Nw)
    raw = jnp.pad(xw.astype(jnp.float32), ((0, 0), (0, pad))).reshape(
        B, rows_total, LANE)

    b_full, b_win, cl, band = _matrices(pcfg)
    # (B, 1, LANE): the per-utterance ballast; the trailing (1, LANE)
    # block equals the array's trailing dims (Mosaic requires full-dim
    # or 8/128-divisible blocks — a (1, LANE) block of a (B, LANE)
    # array fails the sublane rule on hardware)
    ball_in = jnp.broadcast_to(
        ball.astype(jnp.float32)[:, None, None], (B, 1, LANE))

    vmem_const = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, plan=plan, hop=hop),
        grid=(B, tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, 1, LANE), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [vmem_const] * 4,
        out_specs=pl.BlockSpec(
            (1, plan.tile_t, 2 * LANE), lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, tiles * plan.tile_t, 2 * LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, plan.rows_span, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * tiles * plan.tile_t
            * (2 * plan.Lpad * 2 * LANE + 2 * plan.Lpad * LANE),
            bytes_accessed=B * (rows_total * LANE
                                + tiles * plan.tile_t * 2 * LANE) * 4,
            transcendentals=0,
        ),
    )(raw, ball_in, jnp.asarray(b_full), jnp.asarray(b_win),
      jnp.asarray(cl), jnp.asarray(band))

    return (out[:, :T, :n_lags], out[:, :T, LANE: LANE + n_lags])
