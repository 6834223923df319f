"""Fused Pallas TPU kernel v2: radix-2 DIT MFCC / log-mel in VMEM.

Why a second kernel: the on-device A/B (bench/ab_dft.json) showed the
radix-2 factorization — exactly 2.0x fewer true MACs than the direct DFT
— LOSES in XLA (234-267k vs direct's 290k audio-sec/s) because its
deinterleave / frame-concat / bin-reorder steps materialize relayouts in
HBM.  Inside one Pallas kernel every one of those intermediates lives in
VMEM/registers, so the MAC savings are actually harvested:

    grid = (B, T_tiles); per step, per parity stream s in {even, odd}:
      DMA   stream hop2-blocks (TILE_T + Q_PAD, hop2) HBM -> VMEM
      VPU   LHS_s = lane-concat of n_blocks sublane-rolled views
            -> (TILE_T, n_blocks*hop2)   e.g. 240 cols @ 25/10 ms
      MXU   S = LHS_s @ [cos | sin]      ONE packed GEMM per stream:
            K pads 240->256 (1.07x), N = n_fft/2 lanes exact
      VPU   s_last = rowsum(LHS_s * nyq) (half-DFT Nyquist, rank-1)
    then (all VPU/MXU, no HBM):
      VPU   twiddle combine -> p_plus, p_minus, mid   (no bin reorder!)
      MXU   E = p_plus @ M1 + p_minus @ M2 (+ mid x m_mid)
            where M1/M2 are the mel matrix with the DIT output->natural
            bin permutation FOLDED IN (constant-folded at trace time)
      VPU   logmel = accurate_log(max(E, floors))
      MXU   feat = logmel @ DCT            (skipped in log-mel mode)

MACs per frame (25/10 ms MFCC-13, f32 lane-padded): 2x256x256 DFT +
2x128x128 mel + 128x128 DCT ~= 180k vs the XLA direct path's ~376k —
and HBM traffic is exactly audio in + features out (the host-side
parity deinterleave is the only extra pass, ~2 bytes/sample).

Numerical contract matches the jnp dit2 path (f32, HIGHEST, same
accurate log); parity pinned in tests/test_kernels.py (interpret mode)
and on hardware by bench/ab_backend.py.

Reference analog: this is the "codegen" stage of the pipeline
(SURVEY.md §2b) — the reference's one implemented backend emits x86-64
NASM (/root/reference/src/mfcc/codegen.c:40-59); here the golden backend
emits a single Mosaic kernel per (batch, tile) grid step.
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
from .fused_mfcc import _acc_log, _round_up, LANE, Q_PAD


class _PlanDit(NamedTuple):
    """Static geometry shared by wrapper and kernel."""
    hop2: int          # hop/2: valid lanes per stream block row
    hop2_pad: int      # hop2 rounded up to LANE (Mosaic DMA slices must be
                       # lane-aligned; compute-side sub-slices need not be)
    nbe: int           # even-stream blocks per frame (ceil(Le/hop2))
    nbo: int           # odd-stream blocks per frame
    le: int            # even-stream samples per frame (ceil(frame_len/2))
    lo: int            # odd-stream samples per frame
    nb2: int           # n_fft/4: half-DFT bins in the packed GEMM
    tile_t: int
    mels_pad: int
    out_pad: int
    apply_dct: bool
    append_energy: bool
    log_floor: float
    rel_floor: float   # 10^(-dynamic_range_db/10); 0.0 disables
    precision: str


def dit_kernel_eligible(cfg: FeatureConfig) -> bool:
    """Same algebraic requirements as the jnp dit2 path, plus the kernel's
    roll-lookahead bound (n_blocks - 1 <= Q_PAD rows)."""
    if not (cfg.n_fft % 4 == 0 and cfg.hop_len % 2 == 0
            and cfg.frame_len >= 2):
        return False
    hop2 = cfg.hop_len // 2
    le = (cfg.frame_len + 1) // 2
    return -(-le // hop2) - 1 <= Q_PAD


def _concat_rolled(buf, tile: int, n_blocks: int, rows: int, hop2: int):
    """(rows, hop2_pad) VMEM buffer -> (tile, n_blocks*hop2) frame matrix:
    lane-concat of sublane-rolled views (roll by -k == rows-k), keeping
    only the hop2 valid lanes of each row."""
    pieces = []
    for k in range(n_blocks):
        vk = buf if k == 0 else pltpu.roll(buf, shift=rows - k, axis=0)
        pieces.append(vk[:tile, :hop2])
    return pieces[0] if n_blocks == 1 else jnp.concatenate(pieces, axis=1)


def _kernel(even_hbm, odd_hbm, be, bo, bel, bol, tw, m1, m2, mmid, dctm,
            out_ref, se, so, sem_e, sem_o, *, plan: _PlanDit):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    tile, hop2, nb2 = plan.tile_t, plan.hop2, plan.nb2
    rows = tile + Q_PAD
    prec = {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[plan.precision]

    # ---- double-buffered DMA: each grid step waits on the copy the
    # PREVIOUS step started for it, then immediately prefetches the next
    # step's rows into the other slot, so HBM reads ride under the MXU
    # work (grid steps are sequential on TPU; scratch persists across
    # them).  slot = step % 2.
    step = b * n_tiles + t
    slot = jax.lax.rem(step, 2)

    def dmas(bi, ti, sl):
        return (pltpu.make_async_copy(
                    even_hbm.at[bi, pl.ds(ti * tile, rows), :],
                    se.at[sl], sem_e.at[sl]),
                pltpu.make_async_copy(
                    odd_hbm.at[bi, pl.ds(ti * tile, rows), :],
                    so.at[sl], sem_o.at[sl]))

    @pl.when(step == 0)
    def _():
        for cp in dmas(b, t, slot):
            cp.start()

    nstep = step + 1
    nb_, nt_ = nstep // n_tiles, jax.lax.rem(nstep, n_tiles)

    @pl.when(nstep < pl.num_programs(0) * n_tiles)
    def _():
        for cp in dmas(nb_, nt_, 1 - slot):
            cp.start()

    for cp in dmas(b, t, slot):
        cp.wait()

    # ---- per-stream packed half-DFT (MXU) + rank-1 Nyquist (VPU) ----
    def stream(buf, basis, last_col, n_blocks):
        lhs = _concat_rolled(buf[slot], tile, n_blocks, rows, hop2)
        s = jnp.dot(lhs, basis[:], preferred_element_type=jnp.float32,
                    precision=prec)                      # (tile, 2*nb2)
        s_last = jnp.sum(lhs * last_col[:], axis=1, keepdims=True)
        return s, s_last

    E, e_last = stream(se, be, bel, plan.nbe)
    O, o_last = stream(so, bo, bol, plan.nbo)

    # ---- twiddle combine (VPU; tw = [cos | sin] rows of length nb2) ----
    ct = tw[0:1, :nb2]
    st = tw[0:1, nb2:]
    e_re, e_im = E[:, :nb2], E[:, nb2:]
    o_re, o_im = O[:, :nb2], O[:, nb2:]
    b_re = ct * o_re - st * o_im
    b_im = ct * o_im + st * o_re
    p_plus = (e_re + b_re) ** 2 + (e_im + b_im) ** 2     # bins 0..nb2-1
    p_minus = (e_re - b_re) ** 2 + (e_im - b_im) ** 2    # bins n_fft/2-j
    mid = e_last * e_last + o_last * o_last              # bin nb2

    # ---- mel with the bin permutation folded into M1/M2 (MXU) ----
    energies = (jnp.dot(p_plus, m1[:], preferred_element_type=jnp.float32,
                        precision=prec)
                + jnp.dot(p_minus, m2[:], preferred_element_type=jnp.float32,
                          precision=prec)
                + mid * mmid[0:1, :])
    if plan.rel_floor > 0.0:
        rel = jnp.max(energies, axis=1, keepdims=True) * plan.rel_floor
        energies = jnp.maximum(energies, rel)
    logmel = _acc_log(jnp.maximum(energies, plan.log_floor))

    feat = (jnp.dot(logmel, dctm[:], preferred_element_type=jnp.float32,
                    precision=prec)
            if plan.apply_dct else logmel)

    if plan.append_energy:
        # frame energy = sum over both parity streams' frame samples
        # (padding lanes >= hop2 are zeros: they never contribute)
        e = jnp.zeros((tile, 1), jnp.float32)
        for buf, ls, nb in ((se, plan.le, plan.nbe), (so, plan.lo, plan.nbo)):
            sq = buf[slot] * buf[slot]
            row_full = jnp.sum(sq, axis=1, keepdims=True)
            rtail = ls - (nb - 1) * hop2
            lane = jax.lax.broadcasted_iota(jnp.int32, sq.shape, 1)
            row_tail = jnp.sum(jnp.where(lane < rtail, sq, 0.0), axis=1,
                               keepdims=True)
            for k in range(nb):
                rk = row_full if k < nb - 1 else row_tail
                rk = rk if k == 0 else pltpu.roll(rk, shift=rows - k, axis=0)
                e = e + rk[:tile, :]
        loge = _acc_log(jnp.maximum(e, plan.log_floor))
        col = jax.lax.broadcasted_iota(jnp.int32, feat.shape, 1)
        feat = jnp.where(col == 0, loge, feat)

    out_ref[0, :, :] = feat


@functools.lru_cache(maxsize=16)
def _matrices(cfg: FeatureConfig, mels_pad: int, out_pad: int,
              apply_dct: bool):
    """Float32 VMEM constants (all math float64 in the oracle layer).

    Basis rows are zero-padded from the stream length Ls up to
    n_blocks*hop2 (the concat-frame K), so concat columns holding samples
    beyond the frame multiply to zero.  M1/M2 fold the DIT->natural bin
    permutation into the mel projection: natural bin k reads p_plus[k]
    for k < nb2, mid for k == nb2, p_minus[n_fft/2 - k] for k > nb2, and
    p_minus[0] is the true Nyquist bin 2*nb2 — so
        E = p_plus @ M1 + p_minus @ M2 + mid * m_mid
    with M1[j] = mel[j], M2[0] = mel[2*nb2], M2[j>0] = mel[2*nb2 - j].
    """
    (be, bel), (bo, bol), ct, st = spectrum_op.dit_matrices(cfg)
    hop2 = cfg.hop_len // 2
    nb2 = (cfg.n_fft // 2) // 2

    def padded(basis, last):
        L = basis.shape[0]
        K = -(-L // hop2) * hop2
        b = np.zeros((K, basis.shape[1]), np.float32)
        b[:L] = basis
        l = np.zeros((1, K), np.float32)   # broadcast row for VPU rank-1
        l[0, :L] = last[:, 0]
        return b, l

    be_p, bel_p = padded(be, bel)
    bo_p, bol_p = padded(bo, bol)
    tw = np.concatenate([ct, st]).astype(np.float32)[None, :]  # (1, 2*nb2)

    mel = mel_op.mel_matrix(cfg)                 # (n_bins, n_mels) f64
    m1 = np.zeros((nb2, mels_pad), np.float32)
    m2 = np.zeros((nb2, mels_pad), np.float32)
    m1[:, : cfg.n_mels] = mel[:nb2]
    m2[0, : cfg.n_mels] = mel[2 * nb2]
    m2[1:, : cfg.n_mels] = mel[2 * nb2 - 1: nb2: -1]
    mmid = np.zeros((1, mels_pad), np.float32)
    mmid[0, : cfg.n_mels] = mel[nb2]

    d = np.zeros((mels_pad, out_pad), np.float32)
    if apply_dct:
        d[: cfg.n_mels, : cfg.n_mfcc] = dct_op.dct_matrix(cfg)
    return be_p, bo_p, bel_p, bol_p, tw, m1, m2, mmid, d


def fused_features_dit(y: jnp.ndarray, cfg: FeatureConfig, *,
                       apply_dct: bool = True,
                       tile_t: int | None = None,
                       interpret: bool = False) -> jnp.ndarray:
    """(B, N) PRE-EMPHASIZED audio -> (B, T, n_out) features.

    Host-side prep is one parity deinterleave + hop2-block reshape per
    stream (XLA, fused); everything else happens in the kernel.

    tile_t None -> adaptive: the largest of {128, 256, 512} that doesn't
    overshoot T (measured on v5e: 512 -> 337.0k, 256 -> 327.1k,
    128 -> 315.9k audio-sec/s — fewer grid steps amortize per-step
    overhead; past 512 VMEM pressure flattens the curve).
    """
    assert y.ndim == 2, "batch input (B, N) expected"
    if not dit_kernel_eligible(cfg):
        raise ValueError("config not eligible for the DIT kernel "
                         "(odd hop, n_fft % 4 != 0, or frame/hop too large)")
    B, N = y.shape
    if tile_t is None:
        T0 = max(cfg.num_frames(N), 1)
        tile_t = min(512, _round_up(T0, 128))
    hop2 = cfg.hop_len // 2
    le = (cfg.frame_len + 1) // 2
    lo = cfg.frame_len // 2
    nbe = -(-le // hop2)
    nbo = max(-(-lo // hop2), 1)
    T = cfg.num_frames(N)
    n_out = cfg.n_mfcc if apply_dct else cfg.n_mels
    if T <= 0:
        return jnp.zeros((B, 0, n_out), jnp.float32)

    tiles = _round_up(T, tile_t) // tile_t
    rows_needed = tiles * tile_t + Q_PAD
    n2 = rows_needed * hop2
    hop2_pad = _round_up(hop2, LANE)

    def blocks(stream):
        s = stream.astype(jnp.float32)
        if s.shape[1] < n2:
            s = jnp.pad(s, ((0, 0), (0, n2 - s.shape[1])))
        b = s[:, :n2].reshape(B, rows_needed, hop2)
        if hop2_pad > hop2:
            # Mosaic DMA slices must be lane-aligned: pad rows to 128 lanes
            b = jnp.pad(b, ((0, 0), (0, 0), (0, hop2_pad - hop2)))
        return b

    even = blocks(y[:, 0::2])
    odd = blocks(y[:, 1::2])

    mels_pad = _round_up(cfg.n_mels, LANE)
    out_pad = _round_up(cfg.n_mfcc, LANE) if apply_dct else mels_pad
    be, bo, bel, bol, tw, m1, m2, mmid, d = _matrices(
        cfg, mels_pad, out_pad, apply_dct)
    nb2 = (cfg.n_fft // 2) // 2

    plan = _PlanDit(hop2=hop2, hop2_pad=hop2_pad, nbe=nbe, nbo=nbo,
                    le=le, lo=lo, nb2=nb2,
                    tile_t=tile_t, mels_pad=mels_pad, out_pad=out_pad,
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
            pl.BlockSpec(memory_space=pl.ANY),   # even blocks in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # odd blocks in HBM
            vmem_const, vmem_const, vmem_const, vmem_const, vmem_const,
            vmem_const, vmem_const, vmem_const, vmem_const,
        ],
        out_specs=pl.BlockSpec(
            (1, tile_t, out_pad), lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, tiles * tile_t, out_pad),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile_t + Q_PAD, hop2_pad), jnp.float32),
            pltpu.VMEM((2, tile_t + Q_PAD, hop2_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * tiles * tile_t
            * (2 * _round_up(nbe * hop2, LANE) * 2 * nb2     # DFT GEMMs
               + 2 * nb2 * mels_pad                          # mel
               + (mels_pad * out_pad if apply_dct else 0)),
            bytes_accessed=B * (2 * rows_needed * hop2_pad
                                + tiles * tile_t * out_pad) * 4,
            transcendentals=B * tiles * tile_t * mels_pad,
        ),
    )(even, odd, jnp.asarray(be), jnp.asarray(bo), jnp.asarray(bel),
      jnp.asarray(bol), jnp.asarray(tw), jnp.asarray(m1), jnp.asarray(m2),
      jnp.asarray(mmid), jnp.asarray(d))

    return out[:, :T, :n_out]
