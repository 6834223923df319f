"""Feature pipelines ("models") built from the ops stages.

- :mod:`mfcc`      — flagship MFCC-13 pipeline (single + batched/ragged)
- :mod:`logmel`    — log-mel-80 variant (DCT skipped) with delta appends
- :mod:`spectrogram` — linear power/log spectrogram variant
- :mod:`plp`       — perceptual linear prediction (bark + LPC cepstra)
- :mod:`pitch`     — NCCF + Viterbi pitch tracker (Kaldi-style features)
- :mod:`pitch_online` — bounded-latency streaming pitch (delayed Viterbi)
- :mod:`streaming` — chunked low-latency STFT with overlap carry state
- :mod:`trainable` — learnable filterbank front-end (training-step demo)
"""

from . import (mfcc, logmel, spectrogram, plp, pitch,  # noqa: F401
               pitch_online, streaming, trainable)
