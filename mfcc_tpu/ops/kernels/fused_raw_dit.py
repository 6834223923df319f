"""Fused Pallas TPU kernel v4: RAW audio -> MFCC via radix-2 DIT,
combining the two proven round-2 lessons (VERDICT r2 next-step #3):

- the raw kernel (fused_raw.py) won by deleting ALL XLA-side prep
  (pre-emphasis + frame assembly in-register on a lane-phase-periodic
  layout) but pays the direct DFT's 2x MACs;
- the DIT kernel (fused_dit.py) won the MAC halving by keeping every
  intermediate in VMEM, but its XLA-side prep cost ~47% of its time.

This kernel does the DIT math ON the raw layout.  The only wrapper op is
one fused pad + parity deinterleave (x.reshape(B, N/2, 2).transpose —
a single bandwidth-bound XLA copy, measured ~5% of kernel time, vs the
DIT kernel's 47% prep chain).  Everything else is in-kernel:

  DMA   (2, LEAD + rows_span, LANE) half-rate parity rows, double-buffered
  VPU   pre-emphasis across parities: ze[m] = xe[m] - a*xo[m-1] (one
        lane-roll + one sublane-roll), zo[m] = xo[m] - a*xe[m] (aligned!)
  VPU   rows -> periods per parity: frames of phase p are static lane
        slices [p*hop/2, p*hop/2 + ceil(frame_len/2)) of one period row
  MXU   per phase, per parity: ONE packed half-DFT GEMM
        (K = frame_len/2, N = n_fft/2 lanes EXACT: [cos 0..H/2 |
        sin 1..H/2-1] where H = n_fft/2 — sin[0] = sin[H/2] = 0 are
        simply not stored, and the half-DFT Nyquist bin rides in the
        cos block, so no rank-1 side channel exists at all)
  VPU   twiddle combine with ZERO lane reversals: with A = E[k],
        B = W^k O[k] (k = 0..H/2), conjugate symmetry gives
        |X[k]|^2       = (Ec+Br)^2 + (Es+Bi)^2   and
        |X[H-k]|^2     = (Ec-Br)^2 + (Es-Bi)^2
        simultaneously — the upper half of the spectrum comes out in
        REVERSED bin order, and the reversal is folded into the constant
        mel matrix (mel_minus row k = mel row for bin H-k).  The full-DFT
        Nyquist bin H is exactly P_minus[0]; bins never relayout.
        Aligning Es/Os with Ec/Oc costs one half-rotation
        (pltpu.roll by H/2 — cyclic, so sign-free) + one constant mask.
  VPU   pack P+/P- into ONE H-lane power vector (one half-rotation +
        select; the leftover 257th bin — the full-DFT Nyquist, exactly
        P_minus[0] — is a rank-1 VPU update on the mel output)
  MXU   mel as ONE (H, n_mels_pad) GEMM, accurate log, DCT — as v3
  VPU   phase interleave, out tile write

Padded MACs/frame at 16 kHz 25/10 MFCC-13: DFT 2*(256x256) = 131k vs
v3's 512x512 = 262k; + mel 256x128 = 33k + DCT 16k = ~180k total vs
v3's ~311k (crossing phases add splits; see bench/ab_backend.json r3 for
the measured outcome).

Numerical contract: identical stages to the jnp XLA dit2 path
(ops/spectrum.py _dit_combine uses the SAME P+/P- identity; f32,
HIGHEST, accurate log, signal-convention pre-emphasis x[-1] := x[0]).
Parity pinned in tests/test_kernels.py (interpret mode) and on hardware
by the bench accuracy gate.

Reference analog: SURVEY.md §2b maps the reference's codegen stage to
this kernel family (/root/reference/src/mfcc/codegen.c:40-59).
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


class _PlanDit(NamedTuple):
    P: int            # frames per lane-phase period (half-rate)
    rpp: int          # half-rate rows per period ((hop/2)*P/LANE)
    nper: int         # periods per tile (+1 lookahead)
    rows_span: int    # DMA rows per step per parity (excl. LEAD)
    tile_t: int
    fpp: int          # frames per phase per tile
    H: int            # n_fft // 2 (half-DFT length = GEMM lanes)
    Le: int           # even-parity frame samples (ceil(frame_len/2))
    Lo: int           # odd-parity frame samples
    mels_pad: int
    out_pad: int
    apply_dct: bool
    append_energy: bool
    preemph: float
    log_floor: float
    rel_floor: float
    precision: str
    merged: bool      # one (P*fpp, L) GEMM per parity vs P small ones
    pm_out: bool      # write phase-major rows; wrapper deinterleaves
    half: bool        # 128-lane combine halves (merged only)
    projection: str   # "mel" (default) | "bark" (PLP front half: the
                      # bark+equal-loudness filterbank replaces mel and
                      # the kernel output is floored-log band energies)
                      # | "spec" (log-power spectrogram: no projection
                      # GEMM at all — the packed |X|^2 vector is logged
                      # in place and shipped in PACKED bin order with
                      # the full-DFT Nyquist in lane H; the wrapper
                      # depermutes with one static relayout)


def raw_dit_kernel_eligible(cfg: FeatureConfig) -> bool:
    """Needs n_fft % 4 == 0 (even half-DFT), an even hop (so every frame
    starts on an even sample and the parity split is frame-invariant), a
    small half-rate lane-phase period (at most 16 phases — 16 kHz 25/10
    has 8, 8 kHz telephone speech 16; each phase is one roll+select in
    the merged assembly), and the frame tail within one lookahead period
    row."""
    if cfg.n_fft % 4 != 0 or cfg.hop_len % 2 != 0 or cfg.frame_len < 2:
        return False
    hop_h = cfg.hop_len // 2
    P = LANE // math.gcd(hop_h, LANE)
    if P > 16:
        return False
    rpp = hop_h * P // LANE
    Le = (cfg.frame_len + 1) // 2
    tail = (P - 1) * hop_h + Le - rpp * LANE
    return tail <= rpp * LANE


def spec_kernel_eligible(cfg: FeatureConfig) -> bool:
    """The spec projection additionally needs H = n_fft/2 lane-aligned:
    _spec_pack concatenates the Nyquist block at lane offset H, and
    Mosaic refuses lane-dim concats at unaligned offsets (the repo's
    documented layout rule).  n_fft 512/1024/... qualify; n_fft 400
    (H = 200) must stay on the XLA path (r4 review finding — interpret
    mode can't catch this class)."""
    return (raw_dit_kernel_eligible(cfg)
            and (cfg.n_fft // 2) % LANE == 0)


def _plan(cfg: FeatureConfig, tile_t: int, apply_dct: bool,
          merged: bool = False, pm_out: bool = False, half: bool = False,
          projection: str = "mel"):
    hop_h = cfg.hop_len // 2
    P = LANE // math.gcd(hop_h, LANE)
    rpp = hop_h * P // LANE
    assert tile_t % (8 * P) == 0 or (tile_t % P == 0 and (tile_t // P) % 8 == 0), \
        "tile must give sublane-aligned frames-per-phase"
    assert projection in ("mel", "bark", "spec")
    assert projection == "mel" or not apply_dct, \
        "bark/spec projections emit band/bin energies; no DCT stage"
    fpp = tile_t // P
    nper = fpp + 1
    rows_span = _round_up(nper * rpp, 8)
    if projection == "spec":
        # packed |X|^2 lanes [0, H) + one aligned LANE block whose col 0
        # carries the full-DFT Nyquist bin -> H + LANE output lanes
        assert (cfg.n_fft // 2) % LANE == 0, \
            "spec projection needs lane-aligned H (spec_kernel_eligible)"
        mels_pad = LANE                       # dummy operands, unused
        out_pad = cfg.n_fft // 2 + LANE
    else:
        n_proj = cfg.n_mels if projection == "mel" else cfg.n_bark
        mels_pad = _round_up(n_proj, LANE)
        out_pad = _round_up(cfg.n_mfcc, LANE) if apply_dct else mels_pad
    # The merged path additionally needs >1 phase (something to merge)
    # and the whole frame inside one period row (roll+select cannot
    # widen lanes).  Deriving half/pm_out from the FULL eligibility here
    # — not just `merged` — keeps the wrapper-side transforms (mcat/mny
    # row swap for half, phase deinterleave for pm_out) in lockstep with
    # the branch the kernel actually takes (ADVICE r3: an ineligible
    # half/pm_out request used to fall back to the per-phase path while
    # the wrapper still applied its transform — silently wrong values).
    Le = (cfg.frame_len + 1) // 2
    merged = merged and P > 1 and Le <= rpp * LANE
    return _PlanDit(
        P=P, rpp=rpp, nper=nper, rows_span=rows_span, tile_t=tile_t,
        fpp=fpp, H=cfg.n_fft // 2, Le=Le,
        Lo=cfg.frame_len // 2, mels_pad=mels_pad, out_pad=out_pad,
        apply_dct=apply_dct,
        # the PLP model layer applies energy/deltas itself after the LPC
        # chain, and its XLA twin applies no relative floor — keep the
        # bark route's numerics identical to ops/plp.bark_loudness_split
        append_energy=cfg.append_energy and projection == "mel"
        and apply_dct,
        preemph=cfg.preemph, log_floor=cfg.log_floor,
        rel_floor=(0.0 if (cfg.dynamic_range_db is None
                           or projection != "mel")
                   else 10.0 ** (-cfg.dynamic_range_db / 10.0)),
        precision=cfg.matmul_precision, merged=merged,
        pm_out=pm_out and merged,
        half=half and merged and projection == "mel",
        projection=projection)


def spec_bin_permutation(cfg: FeatureConfig) -> np.ndarray:
    """Natural bin b -> packed output lane, inverting the kernel's
    conjugate-symmetry layout (lane k <= Hh: bin k; lane Hh + j: bin
    H - j; lane H: full-DFT Nyquist).  Static indices — the wrapper's
    depermute is one XLA relayout, never a TPU dynamic gather."""
    H = cfg.n_fft // 2
    Hh = H // 2
    perm = np.empty((cfg.n_bins,), np.int64)
    for b in range(cfg.n_bins):
        if b <= Hh:
            perm[b] = b
        elif b < H:
            perm[b] = Hh + (H - b)
        else:
            perm[b] = H
    return perm


def _spec_pack(pcat, p_minus):
    """Spectrogram projection: the packed |X|^2 vector plus one aligned
    LANE block whose col 0 carries the full-DFT Nyquist (= p_minus[0]).
    The bin permutation stays packed; the wrapper depermutes with one
    static relayout (spec_bin_permutation)."""
    pad = jax.lax.broadcasted_iota(jnp.int32, (pcat.shape[0], LANE), 1)
    nyq = jnp.where(pad == 0, p_minus[:, :1], 0.0)
    return jnp.concatenate([pcat, nyq], axis=1)


def _phase_gemm(W, Wn, basis, lo, L, row_lanes, prec):
    """Half-DFT GEMM for one phase/parity: lanes [lo, lo+L) of the period
    rows W (with lookahead rows Wn when the span crosses the row edge) @
    the (L, H) packed basis.  Returns (S (fpp, H), sumsq (fpp, 1))."""
    hi = lo + L
    if hi <= row_lanes:
        M = W[:, lo:hi]
        S = jnp.dot(M, basis, preferred_element_type=jnp.float32,
                    precision=prec)
        en = jnp.sum(M * M, axis=1, keepdims=True)
    else:
        k1 = row_lanes - lo
        A = W[:, lo:row_lanes]
        Bp = Wn[:, : hi - row_lanes]
        S = (jnp.dot(A, basis[:k1], preferred_element_type=jnp.float32,
                     precision=prec)
             + jnp.dot(Bp, basis[k1:], preferred_element_type=jnp.float32,
                       precision=prec))
        en = (jnp.sum(A * A, axis=1, keepdims=True)
              + jnp.sum(Bp * Bp, axis=1, keepdims=True))
    return S, en


def _assemble_phases(Wp, Wpn, L, hop_h, P, row_lanes):
    """VMEM frame-block assembly: stack every phase's lane slice into ONE
    (P*fpp, L) matrix (phase-major rows: row p*fpp + f = frame f*P + p).

    This re-materializes frames — but in VMEM, feeding the MXU directly,
    which is the opposite of the HBM frame materialization the raw layout
    exists to avoid: the copies replace the per-phase lane realignments
    the compiler already had to insert in front of each of the 16 small
    GEMMs, and buy ONE large GEMM per parity (M = P*fpp), amortizing the
    basis (RHS) load P-fold and deleting the crossing phases' split
    K-padding (160->256 + 40->128 became part of one K=L GEMM).

    Layout discipline: each phase window is built by a CYCLIC lane roll
    (offset-0 result layout) + select — never by lane-dim concat of
    unaligned slices, which Mosaic refuses ("result/input offset
    mismatch on non-concat dimension"); the final phase stack is a
    sublane-dim concat of identically-laid-out pieces."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (Wp.shape[0], row_lanes), 1)
    rows = []
    for p in range(P):
        lo = p * hop_h
        k1 = row_lanes - lo                 # lanes available in this row
        # roll is cyclic and requires shift >= 0: -lo == k1 (mod lanes)
        w = pltpu.roll(Wp, shift=k1, axis=1) if lo else Wp
        if k1 < L:                          # crossing phase: tail from Wpn
            wn = pltpu.roll(Wpn, shift=k1, axis=1)
            w = jnp.where(lane < k1, w, wn)
        rows.append(w[:, :L])
    return jnp.concatenate(rows, axis=0) if P > 1 else rows[0]


def _kernel(*refs, plan: _PlanDit, hop_h: int):
    # refs = (audio_hbm (B, 2, rows, LANE), basis_e, basis_o, tw (2, H),
    #         mcat, mny, dctm, out_ref, buf, sem)
    audio_hbm, basis_e, basis_o, tw, mcat, mny, dctm = refs[:7]
    out_ref, buf, sem = refs[7:]
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    prec = {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[plan.precision]
    span = LEAD + plan.rows_span
    rows_per_tile = plan.tile_t * hop_h // LANE

    # ---- double-buffered DMA of both parity streams ----
    step = b * n_tiles + t
    slot = jax.lax.rem(step, 2)

    def dma(bi, ti, sl):
        return pltpu.make_async_copy(
            audio_hbm.at[bi, :, pl.ds(ti * rows_per_tile, span), :],
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
    xe = buf[slot, 0]                                 # (span, LANE)
    xo = buf[slot, 1]

    # ---- pre-emphasis in-register, across parities ----
    # z[2m]   = x[2m]   - a*x[2m-1]  ->  ze = xe - a*roll(xo)
    # z[2m+1] = x[2m+1] - a*x[2m]    ->  zo = xo - a*xe   (aligned!)
    if plan.preemph > 0.0:
        a = jnp.float32(plan.preemph)
        pr = pltpu.roll(xo, shift=1, axis=1)          # lane j-1 (lane 0 bad)
        prf = pltpu.roll(pr, shift=1, axis=0)         # row i-1's lane 127
        lane = jax.lax.broadcasted_iota(jnp.int32, xe.shape, 1)
        row = jax.lax.broadcasted_iota(jnp.int32, xe.shape, 0)
        pred = jnp.where(lane == 0, prf, pr)
        # x[-1] := x[0] at the true signal start (t == 0; LEAD rows are
        # wrapper zeros; the signal starts at local (LEAD, 0) of xe)
        pred = jnp.where((t == 0) & (row == LEAD) & (lane == 0), xe, pred)
        ze = xe - a * pred
        zo = xo - a * xe
    else:
        ze, zo = xe, xo

    # ---- rows -> periods per parity ----
    nper, rpp, P, fpp = plan.nper, plan.rpp, plan.P, plan.fpp
    Ze = ze[LEAD: LEAD + nper * rpp, :].reshape(nper, rpp * LANE)
    Zo = zo[LEAD: LEAD + nper * rpp, :].reshape(nper, rpp * LANE)
    We, Wo = Ze[:fpp], Zo[:fpp]
    tail_needed = (P - 1) * hop_h + plan.Le > rpp * LANE
    Wen = Ze[1: 1 + fpp] if tail_needed else None
    Won = Zo[1: 1 + fpp] if tail_needed else None
    row_lanes = rpp * LANE

    H, Hh = plan.H, plan.H // 2
    bas_e, bas_o = basis_e[:], basis_o[:]
    ct = tw[0:1, :]                                   # (1, H); 0 past Hh
    st = tw[1:2, :]
    lane_h = jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)
    smask = ((lane_h >= 1) & (lane_h <= Hh - 1)).astype(jnp.float32)

    # plan.merged already encodes the full eligibility (P > 1 and the
    # frame inside one period row) — computed once in _plan so the
    # wrapper's half/pm_out transforms can never diverge from this branch
    if plan.merged:
        # ---- ONE packed half-DFT GEMM per parity on VMEM-assembled
        # frame blocks (see _assemble_phases); combine runs on the full
        # (P*fpp, H) matrices — identical math, P-fold fewer op launches.
        Fe = _assemble_phases(We, Wen, plan.Le, hop_h, P, row_lanes)
        Fo = _assemble_phases(Wo, Won, plan.Lo, hop_h, P, row_lanes)
        Se = jnp.dot(Fe, bas_e, preferred_element_type=jnp.float32,
                     precision=prec)
        So = jnp.dot(Fo, bas_o, preferred_element_type=jnp.float32,
                     precision=prec)
        if plan.half:
            # ---- half-width combine: the 256-lane combine arrays carry
            # only 129 signal lanes (ct/st/smask are zero past Hh), so
            # slice the GEMM outputs to Hh=128-lane halves and run every
            # elementwise op at half width.  Bin Hh (|X[Hh]|^2 =
            # Se[Hh]^2 + So[Hh]^2 since ct[Hh]=0, st[Hh]=1, Es[Hh]=0)
            # leaves the GEMM row set and enters as the rank-1 update
            # instead of the full-DFT Nyquist, whose mel row takes bin
            # Hh's old slot IN the matrix (wrapper swaps mcat row Hh for
            # the mny row; operand slots unchanged).  pcat lane Hh+j
            # holds p_minus[j] = |X[H-j]|^2 — same rows of mcat as the
            # rolled layout, so the constants beyond the swap are
            # untouched.
            Ssf = pltpu.roll(Se, shift=Hh, axis=1)    # lane j = Se[Hh+j]
            Osf = pltpu.roll(So, shift=Hh, axis=1)
            lane_hh = jax.lax.broadcasted_iota(jnp.int32, (1, Hh), 1)
            mh = (lane_hh >= 1).astype(jnp.float32)   # sin bins 1..Hh-1
            Sc, Oc = Se[:, :Hh], So[:, :Hh]
            Ss = Ssf[:, :Hh] * mh
            Os_ = Osf[:, :Hh] * mh
            ct_h, st_h = ct[:, :Hh], st[:, :Hh]
            Br = ct_h * Oc - st_h * Os_
            Bi = ct_h * Os_ + st_h * Oc
            p_plus = (Sc + Br) ** 2 + (Ss + Bi) ** 2   # bins 0..Hh-1
            p_minus = (Sc - Br) ** 2 + (Ss - Bi) ** 2  # bins H-j, j=0..Hh-1
            pcat = jnp.concatenate([p_plus, p_minus], axis=1)
            pH = Ssf[:, :1] ** 2 + Osf[:, :1] ** 2     # |X[Hh]|^2
            e = (jnp.dot(pcat, mcat[:], preferred_element_type=jnp.float32,
                         precision=prec)
                 + pH * mny[0:1, :])
        else:
            Es = pltpu.roll(Se, shift=Hh, axis=1) * smask
            Os = pltpu.roll(So, shift=Hh, axis=1) * smask
            Br = ct * So - st * Os
            Bi = ct * Os + st * So
            p_plus = (Se + Br) ** 2 + (Es + Bi) ** 2
            p_minus = (Se - Br) ** 2 + (Es - Bi) ** 2
            lane2 = jax.lax.broadcasted_iota(jnp.int32, p_plus.shape, 1)
            pcat = jnp.where(lane2 <= Hh, p_plus,
                             pltpu.roll(p_minus, shift=Hh, axis=1))
            if plan.projection == "spec":
                e = _spec_pack(pcat, p_minus)
            else:
                e = (jnp.dot(pcat, mcat[:],
                             preferred_element_type=jnp.float32,
                             precision=prec)
                     + p_minus[:, :1] * mny[0:1, :])
        if plan.rel_floor > 0.0:
            rel = jnp.max(e, axis=1, keepdims=True) * plan.rel_floor
            e = jnp.maximum(e, rel)
        logmel = _acc_log(jnp.maximum(e, plan.log_floor))
        f = (jnp.dot(logmel, dctm[:], preferred_element_type=jnp.float32,
                     precision=prec)
             if plan.apply_dct else logmel)
        if plan.append_energy:
            en = (jnp.sum(Fe * Fe, axis=1, keepdims=True)
                  + jnp.sum(Fo * Fo, axis=1, keepdims=True))
            loge = _acc_log(jnp.maximum(en, plan.log_floor))
            col = jax.lax.broadcasted_iota(jnp.int32, f.shape, 1)
            f = jnp.where(col == 0, loge, f)
        # phase-major rows (p*fpp + f) -> natural frame order (f*P + p);
        # with pm_out the rows ship phase-major and the WRAPPER
        # deinterleaves (one XLA transpose of the small output tensor,
        # fusable with the downstream mask) instead of the in-kernel
        # sublane permutation.
        if plan.pm_out or P == 1:
            feat = f
        else:
            feat = (f.reshape(P, fpp, plan.out_pad).transpose(1, 0, 2)
                     .reshape(plan.tile_t, plan.out_pad))
        out_ref[0, :, :] = feat
        return

    feats = []
    energies_p = []
    for p in range(P):
        lo = p * hop_h
        Se, en_e = _phase_gemm(We, Wen, bas_e, lo, plan.Le, row_lanes, prec)
        So, en_o = _phase_gemm(Wo, Won, bas_o, lo, plan.Lo, row_lanes, prec)
        # unpack: lanes 0..Hh hold (Ec|Oc) bins 0..Hh; lanes Hh+1..H-1
        # hold (Es|Os) bins 1..Hh-1.  A half-rotation aligns sin with cos
        # (cyclic, so the shift sign is irrelevant); the mask kills the
        # rotated-in cos garbage and pins Es[0] = Es[Hh] = 0.
        Es = pltpu.roll(Se, shift=Hh, axis=1) * smask
        Os = pltpu.roll(So, shift=Hh, axis=1) * smask
        # twiddle: B = W^k O[k], with E = Ec - i*Es, O = Oc - i*Os,
        # W^k = cos - i*sin  (same convention as spectrum._dit_combine)
        Br = ct * So - st * Os
        Bi = ct * Os + st * So
        p_plus = (Se + Br) ** 2 + (Es + Bi) ** 2      # |X[k]|^2, k=0..Hh
        p_minus = (Se - Br) ** 2 + (Es - Bi) ** 2     # |X[H-k]|^2
        # Pack both halves into ONE H-lane vector so mel is a single GEMM
        # (257 bins don't fit 256 lanes — the leftover full-DFT Nyquist
        # |X[H]|^2 = p_minus[0] goes in as a rank-1 VPU update):
        # lanes 0..Hh <- p_plus bins 0..Hh; lane Hh+j <- p_minus[j]
        # = bin H-j (j = 1..Hh-1) via one cyclic half-rotation.
        lane2 = jax.lax.broadcasted_iota(jnp.int32, p_plus.shape, 1)
        pcat = jnp.where(lane2 <= Hh, p_plus,
                         pltpu.roll(p_minus, shift=Hh, axis=1))
        if plan.projection == "spec":
            e = _spec_pack(pcat, p_minus)
        else:
            e = (jnp.dot(pcat, mcat[:], preferred_element_type=jnp.float32,
                         precision=prec)
                 + p_minus[:, :1] * mny[0:1, :])
        if plan.rel_floor > 0.0:
            rel = jnp.max(e, axis=1, keepdims=True) * plan.rel_floor
            e = jnp.maximum(e, rel)
        logmel = _acc_log(jnp.maximum(e, plan.log_floor))
        f = (jnp.dot(logmel, dctm[:], preferred_element_type=jnp.float32,
                     precision=prec)
             if plan.apply_dct else logmel)
        if plan.append_energy:
            energies_p.append(_acc_log(jnp.maximum(en_e + en_o,
                                                   plan.log_floor)))
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
              apply_dct: bool, projection: str = "mel"):
    """Float32 VMEM constants (float64 oracle-layer math).

    Per-parity packed half-DFT bases (L_parity, H):
      col k        (k = 0..Hh)      = w[2m+s] * cos(2*pi*m*k/H)
      col Hh + k   (k = 1..Hh-1)    = w[2m+s] * sin(2*pi*m*k/H)
    — H lanes EXACT (sin[0]/sin[Hh] are identically zero and not stored).

    Twiddles (2, H): rows (cos, sin)(2*pi*k/n_fft) for k <= Hh, 0 beyond.

    Mel matrix mcat (H, mels_pad), matching the packed power vector
    [p_plus lanes 0..Hh | roll(p_minus, Hh) lanes Hh+1..H-1]:
    row k = mel row of bin k (k = 0..Hh); row Hh+j = mel row of bin H-j
    (j = 1..Hh-1).  The one leftover bin H (full-DFT Nyquist — exact:
    p_minus[0] = (Ec0-Oc0)^2 = |X[H]|^2) is the rank-1 row mny
    (1, mels_pad).  The spectral bin permutation lives entirely in these
    constants."""
    from ... import oracle
    fl, H = cfg.frame_len, cfg.n_fft // 2
    Hh = H // 2
    w = oracle.window_fn(cfg.window, fl)
    k = np.arange(Hh + 1, dtype=np.float64)[None, :]
    bases = []
    for s in (0, 1):
        m = np.arange(s, fl, 2, dtype=np.float64)[:, None] // 2
        wp = w[s::2][:, None]
        ang = 2.0 * np.pi * m * k / H
        bas = np.zeros((m.shape[0], H), np.float64)
        bas[:, : Hh + 1] = wp * np.cos(ang)
        bas[:, Hh + 1:] = (wp * np.sin(ang))[:, 1:Hh]
        bases.append(bas.astype(np.float32))
    kk = np.arange(H, dtype=np.float64)
    tw = np.zeros((2, H), np.float64)
    tw[0, : Hh + 1] = np.cos(2.0 * np.pi * kk[: Hh + 1] / cfg.n_fft)
    tw[1, : Hh + 1] = np.sin(2.0 * np.pi * kk[: Hh + 1] / cfg.n_fft)
    if projection == "mel":
        mel = mel_op.mel_matrix(cfg)                  # (n_bins, n_mels) f64
        n_proj = cfg.n_mels
    elif projection == "spec":
        # spectrogram: no projection GEMM — mcat/mny/dctm are unused
        # dummy operands (the kernel's spec branch logs the packed |X|^2
        # vector directly)
        mel = np.zeros((cfg.n_bins, 1), np.float64)
        n_proj = 1
    else:
        # PLP front half: the bark critical-band filterbank with the
        # equal-loudness curve folded in (oracle.bark_filterbank), same
        # (n_bins, n_bands) orientation as the mel matrix
        mel = oracle.bark_filterbank(cfg).T
        n_proj = cfg.n_bark
    mcat = np.zeros((H, mels_pad), np.float64)
    mcat[: Hh + 1, : n_proj] = mel[: Hh + 1]
    for j in range(1, Hh):
        mcat[Hh + j, : n_proj] = mel[H - j]
    mny = np.zeros((1, mels_pad), np.float64)
    mny[0, : n_proj] = mel[H]
    d = np.zeros((mels_pad, out_pad), np.float32)
    if apply_dct:
        d[: cfg.n_mels, : cfg.n_mfcc] = dct_op.dct_matrix(cfg)
    return (bases[0], bases[1], tw.astype(np.float32),
            mcat.astype(np.float32), mny.astype(np.float32), d)


def fused_features_raw_dit(x: jnp.ndarray, cfg: FeatureConfig, *,
                           apply_dct: bool = True,
                           tile_t: int | None = None,
                           merged: bool = False,
                           pm_out: bool = False,
                           half: bool = False,
                           projection: str = "mel",
                           interpret: bool = False) -> jnp.ndarray:
    """(B, N) RAW audio (dither already applied if any) -> (B, T, n_out).

    Pre-emphasis happens inside the kernel.  The wrapper's only XLA work
    is ONE fused pad + parity deinterleave
    (reshape(B, ., 2).transpose(0, 2, 1) — a single bandwidth-bound copy).

    projection="bark" swaps the mel matrix for the bark+equal-loudness
    filterbank and returns (B, T, n_bark) floored-log critical-band
    energies — the fused front half of the PLP pipeline (models/plp.py
    applies exp(0.33 * out) and the LPC chain on the small output).
    """
    assert x.ndim == 2, "batch input (B, N) expected"
    if not raw_dit_kernel_eligible(cfg):
        raise ValueError("config not eligible for the raw DIT kernel")
    B, N = x.shape
    T = cfg.num_frames(N)
    if projection == "bark":
        n_out = cfg.n_bark
    elif projection == "spec":
        n_out = cfg.n_bins
    else:
        n_out = cfg.n_mfcc if apply_dct else cfg.n_mels
    if T <= 0:
        return jnp.zeros((B, 0, n_out), jnp.float32)
    hop_h = cfg.hop_len // 2
    P = LANE // math.gcd(hop_h, LANE)
    if tile_t is None:
        # adaptive, as v3: one grid step for a typical utterance, the
        # smallest phase-aligned tile for short ones.  Tile sweep on v5e
        # (scan protocol, batch 64 x 10 s = 998 frames): 1024 -> 410.7k,
        # 512 -> 379.6k (2 steps + half-size GEMMs), 2048 -> 252.1k (the
        # tile pads 998 -> 2048 COMPUTED frames — overcompute, which the
        # round_up cap below avoids for any T).
        tile_t = min(1024, _round_up(T, 8 * P))
    plan = _plan(cfg, tile_t, apply_dct, merged=merged, pm_out=pm_out,
                 half=half, projection=projection)

    tiles = _round_up(T, plan.tile_t) // plan.tile_t
    rows_per_tile = plan.tile_t * hop_h // LANE
    rows_total = (tiles - 1) * rows_per_tile + LEAD + plan.rows_span
    # full-rate padding: 2*LEAD*LANE leading zeros become LEAD rows in
    # EACH parity; total full-rate samples = 2 * rows_total * LANE
    tail_pad = 2 * rows_total * LANE - 2 * LEAD * LANE - N
    assert tail_pad >= 0, (rows_total, N)
    x = jnp.pad(x.astype(jnp.float32), ((0, 0), (2 * LEAD * LANE, tail_pad)))
    raw = (x.reshape(B, rows_total * LANE, 2)
            .transpose(0, 2, 1)
            .reshape(B, 2, rows_total, LANE))

    bas_e, bas_o, tw, mcat, mny, d = _matrices(
        cfg, plan.mels_pad, plan.out_pad, apply_dct, projection)
    if plan.half:
        # half-combine swaps roles: pcat lane Hh carries the full-DFT
        # Nyquist (p_minus[0]) INSIDE the GEMM, and bin Hh becomes the
        # rank-1 update — exchange mcat row Hh with the mny row.
        Hh_ = cfg.n_fft // 4
        mcat = mcat.copy()
        row_hh = mcat[Hh_].copy()
        mcat[Hh_] = mny[0]
        mny = row_hh[None, :]

    vmem_const = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, plan=plan, hop_h=hop_h),
        grid=(B, tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]   # raw rows in HBM
        + [vmem_const] * 6,
        out_specs=pl.BlockSpec(
            (1, plan.tile_t, plan.out_pad), lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, tiles * plan.tile_t,
                                        plan.out_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 2, LEAD + plan.rows_span, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * tiles * plan.tile_t
            * (2 * _round_up(plan.Le, LANE) * plan.H
               + plan.H * plan.mels_pad
               + (plan.mels_pad * plan.out_pad if apply_dct else 0)),
            bytes_accessed=B * (2 * rows_total * LANE
                                + tiles * plan.tile_t * plan.out_pad) * 4,
            transcendentals=B * tiles * plan.tile_t * plan.mels_pad,
        ),
    )(raw, jnp.asarray(bas_e), jnp.asarray(bas_o), jnp.asarray(tw),
      jnp.asarray(mcat), jnp.asarray(mny), jnp.asarray(d))

    if plan.pm_out:
        tiles_ = out.shape[1] // plan.tile_t
        out = (out.reshape(B, tiles_, plan.P, plan.fpp, plan.out_pad)
                  .transpose(0, 1, 3, 2, 4)
                  .reshape(B, tiles_ * plan.tile_t, plan.out_pad))
    if projection == "spec":
        return out[:, :T, spec_bin_permutation(cfg)]
    return out[:, :T, :n_out]
