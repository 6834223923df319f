"""Trainable MFCC-style front-end (learnable filterbank).

Covers the trainable-front-end capability (PAPERS.md, "Efficient Trainable
Front-Ends for Neural Speech Enhancement"): the mel filterbank and the
per-band compression floor become parameters, initialized at the classic
HTK values, and can be fine-tuned against any downstream loss.  The
built-in objective distills to the float64 oracle features (MSE), which
doubles as an end-to-end differentiability test of the whole pipeline.

Sharding design (the "full training step" validated by
``__graft_entry__.dryrun_multichip``):

- batch axis     -> "data"  (pure data parallelism; gradients psum)
- mel/filter axis-> "feat"  (tensor parallelism: each chip owns a slice of
  the filterbank columns and its band energies; the DCT contraction
  triggers the all-gather XLA inserts from the sharding annotations)

Everything is expressed with ``NamedSharding`` constraints under one
``jax.jit`` — no hand-written collectives (scaling-book recipe).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import optax

from ..config import FeatureConfig
from ..ops import framing, spectrum, dct as dct_op, xmath
from ..ops.mel import mel_matrix
from ..parallel.mesh import FEAT_AXIS


class FrontendParams(NamedTuple):
    mel_w: jnp.ndarray       # (n_bins, n_mels) learnable filterbank
    log_floor: jnp.ndarray   # (n_mels,) learnable softplus-floor (raw)


def init_params(cfg: FeatureConfig) -> FrontendParams:
    fb = jnp.asarray(mel_matrix(cfg), jnp.float32)
    # raw value r such that softplus(r) == cfg.log_floor is far negative;
    # parameterize near it so training starts at the classic pipeline
    raw = np.log(np.expm1(max(cfg.log_floor, 1e-12)))
    return FrontendParams(
        mel_w=fb,
        log_floor=jnp.full((cfg.n_mels,), raw, jnp.float32),
    )


def param_shardings(mesh) -> FrontendParams:
    """Filterbank columns sharded over "feat"; floors likewise."""
    return FrontendParams(
        mel_w=NamedSharding(mesh, P(None, FEAT_AXIS)),
        log_floor=NamedSharding(mesh, P(FEAT_AXIS)),
    )


def forward(params: FrontendParams, audio: jnp.ndarray,
            cfg: FeatureConfig) -> jnp.ndarray:
    """(B, T, n_mfcc) with learnable filterbank.  Full-length rows
    (no ragged lengths here), so center mode resolves statically."""
    audio, cfg = framing.resolve_frame_mode_static(audio, cfg)
    y = framing.preemphasize(audio, cfg)
    power = spectrum.power_spectrum_blocked(y, cfg)
    floor = jax.nn.softplus(params.log_floor)
    energies = jnp.matmul(power, params.mel_w,
                          precision=jax.lax.Precision.HIGHEST)
    logmel = xmath.accurate_log(jnp.maximum(energies, floor))
    return dct_op.cepstra(logmel, cfg)


def loss_fn(params: FrontendParams, audio: jnp.ndarray,
            target: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    pred = forward(params, audio, cfg)
    return jnp.mean((pred - target) ** 2)


def make_optimizer(lr: float = 1e-3, decay_steps: int | None = None):
    """Adam with global-norm clipping (the 1/E gradient through the log
    compression spans orders of magnitude across bands) and optional
    cosine decay (fixed-lr adam oscillates once near the optimum)."""
    sched = lr if decay_steps is None else optax.cosine_decay_schedule(
        lr, decay_steps)
    return optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))


@partial(jax.jit, static_argnames=("cfg", "optimizer"))
def train_step(params: FrontendParams, opt_state, audio: jnp.ndarray,
               target: jnp.ndarray, cfg: FeatureConfig, optimizer):
    """One SGD step.  With sharded inputs/params this is the full
    dp ("data") x tp ("feat") distributed training step."""
    loss, grads = jax.value_and_grad(loss_fn)(params, audio, target, cfg)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    # projected gradient: filter weights are physically nonnegative, and a
    # negative excursion floor-clamps that band's energy (dead band, loss
    # spike) — project back instead of letting momentum carry it under
    params = params._replace(mel_w=jnp.maximum(params.mel_w, 0.0))
    return params, opt_state, loss


def save_params(path: str, params: FrontendParams, cfg: FeatureConfig):
    """Checkpoint the front-end (atomic NPZ; orbax is overkill for two
    tensors, and NPZ keeps the zero-dependency core)."""
    from ..utils.manifest import _atomic_write
    import io as _io
    buf = _io.BytesIO()
    np.savez(buf, mel_w=np.asarray(params.mel_w),
             log_floor=np.asarray(params.log_floor),
             config_hash=np.asarray(cfg.config_hash()))
    _atomic_write(path, buf.getvalue())


def load_params(path: str, cfg: FeatureConfig) -> FrontendParams:
    with np.load(path) as z:
        if str(z["config_hash"]) != cfg.config_hash():
            raise ValueError(
                "checkpoint was trained under a different FeatureConfig")
        return FrontendParams(mel_w=jnp.asarray(z["mel_w"]),
                              log_floor=jnp.asarray(z["log_floor"]))


def fit(audio: np.ndarray, target: np.ndarray, cfg: FeatureConfig,
        steps: int = 100, lr: float = 1e-3):
    """Single-host convenience fit loop (tests / small runs)."""
    params = init_params(cfg)
    opt = make_optimizer(lr, decay_steps=steps)
    opt_state = opt.init(params)
    audio = jnp.asarray(audio)
    target = jnp.asarray(target)
    losses = []
    for _ in range(steps):
        params, opt_state, loss = train_step(
            params, opt_state, audio, target, cfg, opt)
        losses.append(float(loss))
    return params, losses
