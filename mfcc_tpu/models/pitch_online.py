"""Online (streaming) pitch tracker — chunked NCCF + delayed Viterbi.

The batch tracker (models/pitch.py) needs the whole utterance twice:
the Viterbi backward pass starts from the final frame, and the ballast
/ normalization statistics are utterance-global.  This module is the
bounded-latency variant for serving, with three DOCUMENTED deviations
from the batch conventions (docs/conventions.md):

1. **Delayed Viterbi.** Frame t is finalized once frame t + delay has
   been scored, by backtracing from the current best state.  Paths
   merge exponentially fast, so for typical speech `delay=50` (0.5 s)
   emissions almost always equal the batch path; :meth:`flush`
   finalizes the remainder from the true final cost, so with
   ``delay >= T`` the full output path IS the batch path (same ballast
   caveat below).
2. **Causal ballast.** The NCCF silence-suppression term uses the
   running mean frame energy over everything seen so far (including
   the current chunk) instead of the utterance mean.
3. **Causal normalization.** The POV^2-weighted log-pitch mean runs
   over the TRAILING `norm_window` finalized frames (including t)
   instead of a centered window; deltas use the provisional path at
   finalization (depth delay-2, effectively stable).

Split of labor: the device step (jit, static shapes) does the NCCF
GEMMs and the Viterbi forward recursion for a fixed-size chunk of
frames via ``lax.scan``; the host ring-buffers backpointers and NCCF
rows and does the O(delay) backtrace per chunk — a few hundred scalar
ops per frame against the device's GEMMs.  The float64 twin
``online_pitch_np`` mirrors every deviation chunk-for-chunk
(tests/test_pitch_online.py pins f32-vs-f64 parity and the
delay->batch convergence).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import PitchConfig
from ..ops import pitch as pitch_op
from ..ops.resample import StreamingResampler
from .. import oracle


class OnlineChunkState(NamedTuple):
    cost: jnp.ndarray      # (n_lags,) Viterbi running cost
    e_sum: jnp.ndarray     # () running frame-energy sum
    e_cnt: jnp.ndarray     # () frames scored so far
    started: jnp.ndarray   # () int32: 0 until the first valid frame


def init_chunk_state(pcfg: PitchConfig) -> OnlineChunkState:
    n = pcfg.n_lags
    return OnlineChunkState(
        cost=jnp.zeros((n,), jnp.float32),
        e_sum=jnp.zeros((), jnp.float32),
        e_cnt=jnp.zeros((), jnp.float32),
        started=jnp.zeros((), jnp.int32),
    )


def _chunk_nccf(buf: jnp.ndarray, n_frames: int, pcfg: PitchConfig,
                mean_e: jnp.ndarray, precision):
    """buf: (need + (F-1)*hop,) work samples (carry + new).  Returns
    (nccf_b, nccf_p, e0) for the chunk's F frames — identical math to
    ops/pitch.nccf but with the given (causal) ballast mean energy."""
    w, hop = pcfg.frame_len_w, pcfg.hop_len_w
    n, Nc, cos_m, sin_m, cl, sl = pitch_op._corr_matrices(pcfg)
    idx = (np.arange(n_frames) * hop)[:, None] + np.arange(n)[None, :]
    E = buf[idx]                                       # (F, n)
    A = jnp.where(jnp.arange(n) < w, E, 0.0)
    if Nc > n:
        E = jnp.pad(E, ((0, 0), (0, Nc - n)))
        A = jnp.pad(A, ((0, 0), (0, Nc - n)))
    cm, sm = jnp.asarray(cos_m), jnp.asarray(sin_m)
    re_a = jnp.matmul(A, cm, precision=precision)
    im_a = -jnp.matmul(A, sm, precision=precision)
    re_e = jnp.matmul(E, cm, precision=precision)
    im_e = -jnp.matmul(E, sm, precision=precision)
    R = re_a * re_e + im_a * im_e
    I = re_a * im_e - im_a * re_e
    num = (jnp.matmul(R, jnp.asarray(cl), precision=precision)
           - jnp.matmul(I, jnp.asarray(sl), precision=precision))
    cs = jnp.cumsum(E[..., :n] * E[..., :n], axis=-1)
    e0 = cs[..., w - 1]
    lo, hi = pcfg.min_lag, pcfg.max_lag
    e_lag = cs[..., w - 1 + lo: w + hi] - cs[..., lo - 1: hi]
    prod = jnp.maximum(e0[:, None] * e_lag, 1e-30)
    ball = pcfg.ballast * mean_e * mean_e
    return num / jnp.sqrt(prod + ball), num / jnp.sqrt(prod), e0


@partial(jax.jit, static_argnames=("pcfg", "n_frames"))
def online_chunk_step(state: OnlineChunkState, buf: jnp.ndarray,
                      n_valid: jnp.ndarray, pcfg: PitchConfig,
                      n_frames: int):
    """Score one chunk of up to `n_frames` frames (tail chunks pass
    n_valid < n_frames; invalid frames leave every statistic and the
    Viterbi cost untouched).  Returns (state', backptrs (F, n_lags) i32,
    nccf_plain (F, n_lags))."""
    prec = jax.lax.Precision.HIGHEST
    valid = (jnp.arange(n_frames) < n_valid)

    # causal ballast: running mean INCLUDING this chunk's valid frames
    # (twin: online_pitch_np)
    e0_pre = _chunk_nccf(buf, n_frames, pcfg,
                         jnp.zeros((), jnp.float32), prec)[2]
    e_sum = state.e_sum + jnp.where(valid, e0_pre, 0.0).sum()
    e_cnt = state.e_cnt + valid.sum()
    mean_e = e_sum / jnp.maximum(e_cnt, 1.0)
    nccf_b, nccf_p, _ = _chunk_nccf(buf, n_frames, pcfg, mean_e, prec)

    trans = jnp.asarray(pitch_op._trans_matrix(pcfg))

    def fwd(carry, inp):
        cost, started = carry
        s_t, ok = inp
        tot = cost[:, None] + trans
        arg = jnp.argmin(tot, axis=0).astype(jnp.int32)
        stepped = jnp.min(tot, axis=0) - s_t
        fresh = -s_t                             # first valid frame
        new = jnp.where(started > 0, stepped, fresh)
        self_ptr = jnp.arange(cost.shape[0], dtype=jnp.int32)
        ptr = jnp.where(started > 0, arg, self_ptr)
        cost2 = jnp.where(ok, new, cost)
        ptr2 = jnp.where(ok, ptr, self_ptr)
        started2 = jnp.where(ok, 1, started)
        return (cost2, started2), ptr2

    (cost, started), back = jax.lax.scan(
        fwd, (state.cost, state.started), (nccf_b, valid))
    return (OnlineChunkState(cost, e_sum, e_cnt, started),
            back, nccf_p)


class OnlinePitch:
    """Streaming pitch front-end: feed raw audio at pcfg.sample_rate in
    arbitrary-size chunks, receive finalized (k, 3) feature rows
    [pov, causal-normalized log pitch, delta log pitch] with at most
    `delay` frames of latency (plus the chunk/filter buffering).

    ``flush()`` ends the stream, finalizes everything from the true
    final Viterbi cost, and returns the remaining rows.
    """

    def __init__(self, pcfg: PitchConfig, delay: int = 50,
                 chunk_frames: int = 16):
        self.pcfg = pcfg.validate()
        self.delay = int(delay)
        self.F = int(chunk_frames)
        self.rs = (StreamingResampler(pcfg.sample_rate, pcfg.work_rate)
                   if pcfg.work_rate != pcfg.sample_rate else None)
        self.need = pcfg.frame_len_w + pcfg.max_lag
        self.hop = pcfg.hop_len_w
        self._work = np.zeros((0,), np.float64)   # unconsumed work samples
        self._state = init_chunk_state(pcfg)
        # ring buffers: entries behind the finalization point are pruned
        # (a multi-hour stream must not grow host memory — review r2)
        self._back: list[np.ndarray] = []         # per-frame backptrs
        self._nccf: list[np.ndarray] = []         # per-frame plain NCCF
        self._tbase = 0                           # global frame of _back[0]
        self._scored = 0                          # frames scored
        self._done = 0                            # frames finalized
        self._logf0: list[float] = []             # finalized log-f0 tail
        self._wgt: list[float] = []               # finalized POV^2 weights
        self._vbase = 0                           # global frame of _logf0[0]
        self._flushed = False

    # ------------------------------------------------------------------
    def feed(self, chunk: np.ndarray) -> np.ndarray:
        """Raw samples -> (k, 3) finalized feature rows (k may be 0).
        Finalization happens after EACH internal device chunk (so the
        emission schedule depends only on chunk_frames/delay, never on
        how the caller sizes feeds — and matches online_pitch_np)."""
        assert not self._flushed, "feed after flush"
        xw = (self.rs.feed(np.asarray(chunk, np.float64)) if self.rs
              else np.asarray(chunk, np.float64))
        self._work = np.concatenate([self._work, xw])
        return self._score_available()

    def flush(self) -> np.ndarray:
        """End of stream: resampler tail + final Viterbi termination."""
        assert not self._flushed
        if self.rs is not None:
            self._work = np.concatenate([self._work, self.rs.flush()])
        self._flushed = True
        rows = [self._score_available()]
        rows.append(self._finalize(upto=self._scored))
        return np.concatenate(rows)

    # ------------------------------------------------------------------
    def _score_available(self) -> np.ndarray:
        """Run device chunk steps over every complete frame; finalize
        up to (scored - delay) after each chunk."""
        rows = []
        while True:
            avail = (len(self._work) - self.need) // self.hop + 1
            if avail <= 0 or (avail < self.F and not self._flushed):
                break                     # wait for a full device chunk
            nv = min(avail, self.F)
            span = self.need + (self.F - 1) * self.hop
            buf = np.zeros((span,), np.float32)
            have = min(len(self._work), span)
            buf[:have] = self._work[:have]
            self._state, back, nccf_p = online_chunk_step(
                self._state, jnp.asarray(buf), jnp.asarray(nv),
                self.pcfg, self.F)
            back, nccf_p = np.asarray(back), np.asarray(nccf_p)
            for i in range(nv):
                self._back.append(back[i])
                self._nccf.append(nccf_p[i])
            self._scored += nv
            self._work = self._work[nv * self.hop:]
            rows.append(self._finalize(upto=self._scored - self.delay))
        return (np.concatenate(rows) if rows
                else np.zeros((0, 3), np.float32))

    def _finalize(self, upto: int) -> np.ndarray:
        upto = max(min(upto, self._scored), 0)
        if upto <= self._done:
            return np.zeros((0, 3), np.float32)
        # backtrace from the current best terminal state to frame done
        path_end = self._scored - 1
        s = int(np.argmin(np.asarray(self._state.cost)))
        path = {path_end: s}
        for t in range(path_end, self._done, -1):
            s = int(self._back[t - self._tbase][s])
            path[t - 1] = s
        pcfg = self.pcfg
        lag_of = {}

        def log_f0(t):
            if t in lag_of:
                return lag_of[t]
            p = path[t]
            d = oracle._parabolic_lag(self._nccf[t - self._tbase], p)
            v = float(np.log(pcfg.work_rate / (pcfg.min_lag + p + d)))
            lag_of[t] = v
            return v

        rows = []
        W = pcfg.norm_window
        for t in range(self._done, upto):
            c = float(self._nccf[t - self._tbase][path[t]])
            lf = log_f0(t)
            wv = min(max(c, 0.0), 1.0) ** 2
            self._logf0.append(lf)
            self._wgt.append(wv)
            lo = max(0, len(self._logf0) - W)
            wseg = np.asarray(self._wgt[lo:])
            vseg = np.asarray(self._logf0[lo:])
            sw = wseg.sum()
            norm = lf - (float((vseg * wseg).sum() / sw) if sw > 1e-12
                         else lf)
            # delta over the (possibly provisional) path, edges replicated
            def value(u):
                return (self._logf0[u - self._vbase] if u < self._done
                        else log_f0(u))

            D = pcfg.delta_window
            denom = 2.0 * sum(k * k for k in range(1, D + 1))
            d = sum(k * (value(min(t + k, self._scored - 1))
                         - value(max(t - k, 0)))
                    for k in range(1, D + 1)) / denom
            pov = float(2.0 * ((1.0001 - min(max(c, -1.0), 1.0)) ** 0.15
                               - 1.0))
            rows.append((pov, norm, d))
        self._done = upto
        # prune: backtrace/nccf entries behind `done` and log-f0 history
        # beyond the normalization + delta windows are dead
        tdrop = self._done - self._tbase
        if tdrop > 0:
            del self._back[:tdrop]
            del self._nccf[:tdrop]
            self._tbase = self._done
        keep = pcfg.norm_window + pcfg.delta_window
        vdrop = len(self._logf0) - keep
        if vdrop > 0:
            del self._logf0[:vdrop]
            del self._wgt[:vdrop]
            self._vbase += vdrop
        return np.asarray(rows, np.float32)


# --------------------------------------------------------------------------
# float64 twin (chunk-for-chunk mirror of the deviations above)
# --------------------------------------------------------------------------

def online_pitch_np(x: np.ndarray, pcfg: PitchConfig, delay: int = 50,
                    chunk_frames: int = 16) -> np.ndarray:
    """Float64 reference for OnlinePitch: same chunking, same causal
    ballast/normalization, same delayed backtrace — NumPy throughout."""
    from ..ops.resample import resample_poly_numpy
    need = pcfg.frame_len_w + pcfg.max_lag
    hop, F = pcfg.hop_len_w, chunk_frames
    xw_all = (resample_poly_numpy(np.asarray(x, np.float64),
                                  pcfg.sample_rate, pcfg.work_rate)
              if pcfg.work_rate != pcfg.sample_rate
              else np.asarray(x, np.float64))
    T = 0
    if xw_all.shape[0] >= need:
        T = 1 + (xw_all.shape[0] - need) // hop
    if T == 0:
        return np.zeros((0, 3))
    lags = np.arange(pcfg.min_lag, pcfg.max_lag + 1)
    dlog = np.log(lags)[:, None] - np.log(lags)[None, :]
    trans = pcfg.penalty * dlog * dlog
    n = lags.size

    cost = np.zeros((n,))
    started = False
    e_sum = e_cnt = 0.0
    back, nccf_rows, snapshots = [], [], []
    for c0 in range(0, T, F):
        nv = min(F, T - c0)
        # chunk energies first (causal ballast includes this chunk)
        e0s, nums, elags = [], [], []
        for i in range(nv):
            t = c0 + i
            a = xw_all[t * hop: t * hop + pcfg.frame_len_w]
            e0s.append((a * a).sum())
            row_num = np.empty((n,))
            row_el = np.empty((n,))
            for j, L in enumerate(lags):
                b = xw_all[t * hop + L: t * hop + L + pcfg.frame_len_w]
                row_num[j] = (a * b).sum()
                row_el[j] = (b * b).sum()
            nums.append(row_num)
            elags.append(row_el)
        e_sum += sum(e0s)
        e_cnt += nv
        mean_e = e_sum / max(e_cnt, 1.0)
        for i in range(nv):
            prod = np.maximum(e0s[i] * elags[i], 1e-30)
            nb = nums[i] / np.sqrt(prod + pcfg.ballast * mean_e * mean_e)
            npl = nums[i] / np.sqrt(prod)
            nccf_rows.append(npl)
            if not started:
                cost = -nb
                back.append(np.arange(n, dtype=np.int64))
                started = True
            else:
                tot = cost[:, None] + trans
                back.append(np.argmin(tot, axis=0))
                cost = tot[back[-1], np.arange(n)] - nb
        snapshots.append((c0 + nv, cost.copy()))

    # emission loop with the same delayed backtrace
    done = 0
    logf0s, wgts, rows = [], [], []

    def finalize(upto, cost_now, scored):
        nonlocal done
        upto = max(min(upto, scored), 0)
        if upto <= done:
            return
        s = int(np.argmin(cost_now))
        path = {scored - 1: s}
        for t in range(scored - 1, done, -1):
            s = int(back[t][s])
            path[t - 1] = s

        def lf_at(t):
            if t < done:
                return logf0s[t]
            p = path[t]
            d = oracle._parabolic_lag(nccf_rows[t], p)
            return float(np.log(pcfg.work_rate / (pcfg.min_lag + p + d)))

        for t in range(done, upto):
            c = float(nccf_rows[t][path[t]])
            lf = lf_at(t)
            logf0s.append(lf)
            wgts.append(min(max(c, 0.0), 1.0) ** 2)
            lo = max(0, len(logf0s) - pcfg.norm_window)
            wseg = np.asarray(wgts[lo:])
            vseg = np.asarray(logf0s[lo:])
            sw = wseg.sum()
            norm = lf - (float((vseg * wseg).sum() / sw) if sw > 1e-12
                         else lf)
            D = pcfg.delta_window
            denom = 2.0 * sum(k * k for k in range(1, D + 1))
            d = sum(k * (lf_at(min(t + k, scored - 1))
                         - lf_at(max(t - k, 0)))
                    for k in range(1, D + 1)) / denom
            pov = float(2.0 * ((1.0001 - min(max(c, -1.0), 1.0)) ** 0.15
                               - 1.0))
            rows.append((pov, norm, d))
            done = t + 1

    # replay the emission schedule: after scoring the chunk ending at
    # frame G, frames up to G - delay finalize from that chunk's cost
    # snapshot; flush finalizes the rest from the final cost
    for scored, cost_snap in snapshots:
        finalize(scored - delay, cost_snap, scored)
    finalize(T, cost, T)
    return np.asarray(rows, np.float64)
