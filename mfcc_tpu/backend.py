"""Execution backend registry.

The reference declares a multi-target enum and implements one target
(``BuildTargetType``, /root/reference/src/mfcc/mfcc.h:15-21, with only
X86_64 functional).  This framework keeps the same "declared targets, one
golden path per device" shape but makes every entry real:

- ``pallas``  — fused Pallas/Mosaic kernel (primary on TPU): the radix-2
                DIT kernel (kernels/fused_dit) when the config is
                eligible, else the direct hop-block kernel (fused_mfcc)
- ``xla``     — hop-block GEMM jnp pipeline (runs everywhere; the
                reference path that everything is tested against)
- ``auto``    — the measured winner: pallas on TPU when the DIT kernel
                is eligible, xla otherwise

Selection is a static jit argument, so each backend compiles its own
specialized program.
"""

from __future__ import annotations

import jax

BACKENDS = ("auto", "xla", "pallas")


def resolve(name: str = "auto", cfg=None) -> str:
    if name not in BACKENDS:
        raise ValueError(f"backend must be one of {BACKENDS}, got {name!r}")
    if name == "auto":
        # On-device A/B, v5e medians of 7x100 iters (bench/ab_backend.json):
        # pallas DIT kernel 314.0k, XLA hop-block 289.1k, pallas direct
        # kernel 175.1k audio-sec/s/chip — all at <= 3.2e-6 vs the oracle.
        # auto -> the DIT kernel exactly where it exists and wins; the
        # direct kernel LOSES to XLA, so ineligible configs (odd hop,
        # n_fft % 4 != 0) stay on the XLA path.
        if jax.default_backend() == "tpu" and cfg is not None:
            from .ops.kernels import fused_dit
            if fused_dit.dit_kernel_eligible(cfg):
                return "pallas"
        return "xla"
    return name


def pallas_interpret() -> bool:
    """Interpret-mode fallback so the pallas backend also runs on CPU
    (the sanitizer configuration from SURVEY.md §5)."""
    return jax.default_backend() != "tpu"
