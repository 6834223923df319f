"""Pallas TPU kernels for the pitch Viterbi smoother (VERDICT r3 #1b).

The XLA path (ops/pitch._viterbi_one) is a T-step ``lax.scan`` whose
per-step work — a (B, n_lags, n_lags) broadcast-add + min + argmin on
the VPU — measured ~3 us/step at B=64 (bench/ab_viterbi.json), part
compute, part per-step dispatch overhead.  These kernels run the whole
recursion inside two pallas_calls (forward + backtrace) with the cost
vector and score blocks VMEM-resident, deleting the scan's per-step
overhead and the HBM round-trips of the carried state.

Layout: batch rides the LANES (tile of 128 utterances per grid row),
lag states ride the SUBLANES (n_lags padded to a multiple of 8), time is
the sequential grid/loop axis — scores enter as (T, Lp, B_lane).

Forward, per time step, entirely in registers/VMEM:
    cand_i = cost_row_i (1, B) + trans_col_i (Lp, 1)    broadcast add
    strict-< running min/argmin over i — preserves jnp.argmin's
    first-minimal-index semantics; f32 min is exact, so the recursion is
    BIT-IDENTICAL to the XLA scan
    cost' = run_min - s_t ; bp[t] = run_arg
The i-loop is unrolled Python (n_lags iterations of (Lp, 128) VPU ops).
The transition matrix enters as (n_lags, Lp, 1) COLUMNS so each
iteration is a leading-dim index — no in-kernel transpose, no unaligned
lane slice.  Padded lag rows are never selected (their source cost
column carries +1e30 via the padded columns convention below).

Backtrace: a second kernel walks the stored (T, Lp, B) backpointers in
reversed grid order, carrying ``nxt`` (1, B) in scratch; each step is
one one-hot sublane contraction (the pitch post-stage rule: no dynamic
gathers on TPU — ops/pitch._path_neighborhood uses the same idiom).

Time is padded to a multiple of the block; steps past the true T are
``pl.when``-guarded, so the final cost and the backtrace equal the
length-T recursion exactly (not the padded one).

Parity: bit-identical paths to ops/pitch.viterbi (asserted exactly, not
allclose, in tests/test_pitch.py interpret mode).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import PitchConfig
from .fused_mfcc import _round_up, LANE

TB = 64        # time steps per grid block


class _PlanVit(NamedTuple):
    n_lags: int
    Lp: int        # n_lags rounded up to 8 sublanes
    T: int
    Tpad: int
    n_tb: int
    n_btiles: int


def viterbi_kernel_eligible(pcfg: PitchConfig) -> bool:
    return 2 <= pcfg.n_lags <= 512


def _plan(pcfg: PitchConfig, B: int, T: int) -> _PlanVit:
    Lp = _round_up(pcfg.n_lags, 8)
    n_tb = max(1, -(-T // TB))
    return _PlanVit(n_lags=pcfg.n_lags, Lp=Lp, T=T, Tpad=n_tb * TB,
                    n_tb=n_tb, n_btiles=-(-B // LANE))


@functools.lru_cache(maxsize=16)
def _trans_cols(pcfg: PitchConfig, Lp: int) -> np.ndarray:
    """(n_lags, Lp, 1) transition-cost COLUMNS: [i, j, 0] = penalty *
    dlog(lag_i, lag_j)^2 for j < n_lags, 0 for padded j (their cost rows
    are sliced away; keeping them finite avoids inf-inf traps)."""
    lags = np.arange(pcfg.min_lag, pcfg.max_lag + 1, dtype=np.float64)
    d = np.log(lags)[:, None] - np.log(lags)[None, :]
    n = pcfg.n_lags
    t = np.zeros((n, Lp, 1), np.float32)
    t[:, :n, 0] = (pcfg.penalty * d * d).astype(np.float32)
    return t


def _fwd_kernel(scores, trans, bp_out, cost_out, cost, *, plan: _PlanVit):
    g = pl.program_id(1)
    n = plan.n_lags

    def step(k, carry):
        t_glob = g * TB + k

        @pl.when(t_glob == 0)
        def _():
            cost[:, :] = -scores[0]
            bp_out[0, :, :] = jnp.zeros_like(bp_out[0])

        @pl.when((t_glob > 0) & (t_glob < plan.T))
        def _():
            s_t = scores[k]                        # (Lp, B)
            c = cost[:, :]
            run_min = c[0: 1, :] + trans[0]        # (1,B)+(Lp,1) -> (Lp,B)
            run_arg = jnp.zeros(c.shape, jnp.int32)
            for i in range(1, n):
                cand = c[i: i + 1, :] + trans[i]
                upd = cand < run_min
                run_min = jnp.where(upd, cand, run_min)
                run_arg = jnp.where(upd, jnp.int32(i), run_arg)
            cost[:, :] = run_min - s_t
            bp_out[k, :, :] = run_arg
        return carry

    jax.lax.fori_loop(0, TB, step, 0)
    cost_out[0, :, :] = cost[:, :]


def _bwd_kernel(bp, last, path_out, nxt, *, plan: _PlanVit):
    g = pl.program_id(1)                           # reversed time blocks
    gb = plan.n_tb - 1 - g
    sub = jax.lax.broadcasted_iota(jnp.int32, (plan.Lp, LANE), 0)

    def step(kk, carry):
        k = TB - 1 - kk
        t_glob = gb * TB + k

        @pl.when(t_glob == plan.T - 1)
        def _():
            nxt[:, :] = jnp.broadcast_to(last[:], nxt.shape)

        @pl.when(t_glob <= plan.T - 1)
        def _():
            path_out[pl.ds(k, 1), :] = nxt[0: 1, :]

        @pl.when((t_glob > 0) & (t_glob <= plan.T - 1))
        def _():
            # nxt <- bp[t][nxt]: one-hot sublane contraction
            oh = sub == nxt[0: 1, :]
            row = jnp.sum(jnp.where(oh, bp[k], 0), axis=0, keepdims=True)
            nxt[:, :] = jnp.broadcast_to(row, nxt.shape)
        return carry

    jax.lax.fori_loop(0, TB, step, 0)


def viterbi_pallas(nccf_b: jnp.ndarray, pcfg: PitchConfig, *,
                   interpret: bool = False) -> jnp.ndarray:
    """(B, T, n_lags) masked ballasted NCCF -> (B, T) int32 lag indices.
    Bit-identical to ops/pitch.viterbi (see module docstring)."""
    B, T, n = nccf_b.shape
    assert n == pcfg.n_lags
    if T == 0:
        return jnp.zeros((B, 0), jnp.int32)
    plan = _plan(pcfg, B, T)
    Lp, Bp = plan.Lp, plan.n_btiles * LANE
    trans = jnp.asarray(_trans_cols(pcfg, Lp))

    # (B, T, n) -> (T, Lp, Bp): one bandwidth-bound relayout
    s = jnp.pad(nccf_b, ((0, Bp - B), (0, plan.Tpad - T), (0, Lp - n)))
    s = s.transpose(1, 2, 0)

    bp, cost_fin = pl.pallas_call(
        functools.partial(_fwd_kernel, plan=plan),
        grid=(plan.n_btiles, plan.n_tb),
        in_specs=[
            pl.BlockSpec((TB, Lp, LANE), lambda b, g: (g, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, Lp, LANE), lambda b, g: (g, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp, LANE), lambda b, g: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((plan.Tpad, Lp, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Lp, Bp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Lp, LANE), jnp.float32)],
        interpret=interpret,
    )(s, trans)

    # final state: first-minimal-index argmin over the true lag rows
    last = jnp.argmin(cost_fin[0, :n, :], axis=0).astype(jnp.int32)  # (Bp,)

    path = pl.pallas_call(
        functools.partial(_bwd_kernel, plan=plan),
        grid=(plan.n_btiles, plan.n_tb),
        in_specs=[
            pl.BlockSpec((TB, Lp, LANE),
                         lambda b, g, n_tb=plan.n_tb: (n_tb - 1 - g, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE), lambda b, g: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TB, LANE), lambda b, g, n_tb=plan.n_tb: (n_tb - 1 - g, b),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((plan.Tpad, Bp), jnp.int32),
        # (8, LANE), row 0 live: a (1, LANE) scratch is below the int32
        # min-tile sublane count on hardware
        scratch_shapes=[pltpu.VMEM((8, LANE), jnp.int32)],
        interpret=interpret,
    )(bp, last[None, :])

    return path[:T, :B].T
