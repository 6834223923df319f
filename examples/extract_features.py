"""Minimal library usage: WAV in, MFCC out.

    python examples/extract_features.py input.wav [output.npy]
"""

import sys

import numpy as np
import jax.numpy as jnp

from mfcc_tpu import FeatureConfig, models
from mfcc_tpu.utils import wav


def main():
    path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else None

    x, sr = wav.read_wav(path)
    cfg = FeatureConfig(sample_rate=sr).validate()
    feats = np.asarray(models.mfcc.mfcc_jit(jnp.asarray(x), cfg))
    print(f"{path}: {len(x)/sr:.2f} s -> {feats.shape} features "
          f"(config {cfg.config_hash()})")
    if out:
        np.save(out, feats)


if __name__ == "__main__":
    main()
