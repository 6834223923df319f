"""Fine-tune the learnable filterbank front-end (distillation demo).

Initializes at the classic HTK filterbank, perturbs a 'teacher', and
recovers it by gradient descent through the whole pipeline (GEMM DFT,
learnable mel, accurate log with custom JVP, DCT).

    python examples/train_frontend.py
"""

import numpy as np
import jax.numpy as jnp

from mfcc_tpu import FeatureConfig
from mfcc_tpu.models import trainable


def main():
    cfg = FeatureConfig(sample_rate=2000, n_fft=64, n_mels=8,
                        n_mfcc=4).validate()   # tiny for a fast demo
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((8, 2000)) * 0.3).astype(np.float32)

    teacher = trainable.init_params(cfg)
    teacher = teacher._replace(mel_w=teacher.mel_w * 1.5)
    target = trainable.forward(teacher, jnp.asarray(audio), cfg)

    params, losses = trainable.fit(audio, np.asarray(target), cfg,
                                   steps=200, lr=3e-3)
    print(f"loss {losses[0]:.4f} -> {losses[-1]:.4f} "
          f"({losses[0]/max(losses[-1],1e-9):.0f}x)")
    trainable.save_params("frontend.npz", params, cfg)
    print("checkpoint written to frontend.npz")


if __name__ == "__main__":
    main()
