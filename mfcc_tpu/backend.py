"""Execution backend registry.

The reference declares a multi-target enum and implements one target
(``BuildTargetType``, /root/reference/src/mfcc/mfcc.h:15-21, with only
X86_64 functional).  This framework keeps the same "declared targets, one
golden path per device" shape but makes every entry real:

- ``pallas``  — fused Pallas/Mosaic kernel (primary on TPU)
- ``xla``     — hop-block GEMM jnp pipeline (runs everywhere; the
                reference path that everything is tested against)
- ``auto``    — pallas on TPU, xla elsewhere

Selection is a static jit argument, so each backend compiles its own
specialized program.
"""

from __future__ import annotations

import jax

BACKENDS = ("auto", "xla", "pallas")


def resolve(name: str = "auto") -> str:
    if name not in BACKENDS:
        raise ValueError(f"backend must be one of {BACKENDS}, got {name!r}")
    if name == "auto":
        # the hop-block XLA path currently measures FASTER than the fused
        # kernel on v5e (368k vs 319k audio-sec/s) and is the numerically
        # validated golden path, so auto -> xla on every platform; flip to
        # pallas here if/when the kernel wins and passes TPU parity
        return "xla"
    return name


def pallas_interpret() -> bool:
    """Interpret-mode fallback so the pallas backend also runs on CPU
    (the sanitizer configuration from SURVEY.md §5)."""
    return jax.default_backend() != "tpu"
