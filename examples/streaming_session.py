"""Online low-latency feature emission: simulate a live audio session.

Chunks of 10 frames (100 ms) stream through the carry-state STFT; each
step emits completed frames immediately.  Demonstrates that streamed
features are bit-equal to batch features over the same samples.

    python examples/streaming_session.py input.wav
"""

import sys

import numpy as np
import jax.numpy as jnp

from mfcc_tpu import FeatureConfig, models
from mfcc_tpu.models import streaming
from mfcc_tpu.utils import wav


def main():
    x, sr = wav.read_wav(sys.argv[1])
    cfg = FeatureConfig(sample_rate=sr).validate()
    chunk = 10 * cfg.hop_len          # 100 ms per step

    state = streaming.init_state(cfg)
    emitted = []
    for k in range(len(x) // chunk):
        state, feat, n_valid = streaming.process_chunk_jit(
            state, jnp.asarray(x[k * chunk: (k + 1) * chunk]), cfg)
        emitted.append(np.asarray(feat)[: int(n_valid)])
        print(f"t={100*(k+1):5d} ms  +{int(n_valid)} frames")

    streamed = np.concatenate(emitted)
    batch = np.asarray(models.mfcc.mfcc_jit(jnp.asarray(x), cfg))
    err = np.abs(streamed - batch[: len(streamed)]).max()
    print(f"{len(streamed)} frames streamed; max |stream - batch| = {err:.2e}")


if __name__ == "__main__":
    main()
