"""Hand-written Pallas/Mosaic TPU kernels for the hot path.

The TPU-native analog of the reference's native (C) implementation layer
(SURVEY.md §2b): where the reference hand-writes scalar loops in C, this
framework hand-writes MXU/VPU kernels in Pallas.

- :mod:`fused_dit` — single-kernel audio -> cepstra via the radix-2 DIT
  factorization done entirely in VMEM (2x fewer MACs than direct; the
  golden TPU path — see fused_dit module docstring for why this wins in
  Pallas but loses in XLA).
- :mod:`fused_mfcc` — single-kernel direct hop-block variant (fallback
  for configs the DIT kernel can't take: odd hop, n_fft % 4 != 0).
- :mod:`fused_raw` — v3: consumes RAW audio (pre-emphasis and frame
  assembly in-kernel via a lane-phase-periodic layout), deleting the
  XLA-side prep that the scan-protocol ablation showed costs ~47% of
  the DIT pipeline's time (bench/kernel_probe.py).
- :mod:`fused_raw_dit` — v4/v5: the radix-2 DIT math ON the raw layout
  (half-rate parity streams, conjugate-symmetry combine with the bin
  permutation folded into the mel matrix).  The r3 winner in its v5
  merged-phase form (one (P*fpp, L) GEMM per parity; 431.7k vs v4's
  411.0k vs v3's 371.4k audio-sec/s, bench/ab_backend.json) for
  cepstral outputs and bounded-range (<= 50 dB) log-mel; unbounded
  log-mel stays on v3 (valley-accuracy, see module docstring).

- :mod:`fused_nccf` — r4: the pitch NCCF stage as one kernel (in-VMEM
  frame assembly on the work-rate lane-phase layout, packed [cos|sin]
  spectra, correlation-theorem combine, lag-grid IDFT + window-energy
  GEMMs) — the v3->v5 playbook applied to the pitch front end
  (bench/ab_viterbi.json r4).
- :mod:`fused_viterbi` — r4: the pitch Viterbi forward recursion and
  backtrace as two kernels (batch on lanes, lags on sublanes, the whole
  T-step chain inside the grid) — bit-identical paths to the lax.scan.

The raw-DIT kernel also serves PLP (projection="bark": the
bark+equal-loudness matrix replaces mel, output = floored-log band
energies) and the fused serving path (models/streaming.
process_chunks_batch_fused).

Every kernel ships with an ``interpret=True`` parity path and is tested
against the jnp stages on CPU (tests/test_kernels.py) — the TPU analog of
a sanitizer build (SURVEY.md §5).
"""

from . import fused_mfcc     # noqa: F401
from . import fused_dit      # noqa: F401
from . import fused_raw      # noqa: F401
from . import fused_raw_dit  # noqa: F401
from . import fused_nccf     # noqa: F401


def fused_raw_dit_route(x, cfg, *, apply_dct, projection="mel"):
    """Shared raw-DIT kernel invocation for the model-layer consumers
    (MFCC/log-mel via models/mfcc, PLP bark, spectrogram spec): 1D/2D
    squeeze handling + the merged plan + interpret wiring live in ONE
    place (r4 review: three hand-rolled copies had started to drift).
    Callers decide eligibility/resolution; this only invokes."""
    from ... import backend as backend_lib
    squeeze = x.ndim == 1
    xb = x[None, :] if squeeze else x
    feat = fused_raw_dit.fused_features_raw_dit(
        xb, cfg, apply_dct=apply_dct, merged=True, projection=projection,
        interpret=backend_lib.pallas_interpret())
    return feat[0] if squeeze else feat


def fused_features_auto(y, cfg, *, apply_dct=True, interpret=False):
    """Backend "pallas" entry: DIT kernel when eligible, else direct."""
    if fused_dit.dit_kernel_eligible(cfg):
        return fused_dit.fused_features_dit(
            y, cfg, apply_dct=apply_dct, interpret=interpret)
    return fused_mfcc.fused_features(
        y, cfg, apply_dct=apply_dct, interpret=interpret)
