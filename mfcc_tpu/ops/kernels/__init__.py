"""Hand-written Pallas/Mosaic TPU kernels for the hot path.

The TPU-native analog of the reference's native (C) implementation layer
(SURVEY.md §2b): where the reference hand-writes scalar loops in C, this
framework hand-writes MXU/VPU kernels in Pallas.

- :mod:`fused_mfcc` — single-kernel audio -> cepstra: hop-block DFT GEMMs,
  power, mel projection, accurate log, DCT, all resident in VMEM.

Every kernel ships with an ``interpret=True`` parity path and is tested
against the jnp stages on CPU (tests/test_kernels.py) — the TPU analog of
a sanitizer build (SURVEY.md §5).
"""

from . import fused_mfcc  # noqa: F401
