"""Streaming pitch tracking: feed a WAV in 100 ms chunks, print the
finalized [pov, normalized log pitch, delta] rows as they emit (at most
`delay` frames behind the audio).

    python examples/online_pitch.py input.wav [delay_frames]
"""

import sys

import numpy as np

from mfcc_tpu.config import PitchConfig
from mfcc_tpu.models.pitch_online import OnlinePitch
from mfcc_tpu.utils import wav


def main():
    path = sys.argv[1]
    delay = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    x, sr = wav.read_wav(path)
    pcfg = PitchConfig(sample_rate=sr).validate()
    op = OnlinePitch(pcfg, delay=delay)

    feed = sr // 10                        # 100 ms
    emitted = 0
    for i in range(0, x.size, feed):
        rows = op.feed(x[i: i + feed])
        for r in rows:
            print(f"frame {emitted:5d}  pov {r[0]:+.3f}  "
                  f"norm_log_f0 {r[1]:+.4f}  delta {r[2]:+.5f}")
            emitted += 1
    for r in op.flush():
        print(f"frame {emitted:5d}  pov {r[0]:+.3f}  "
              f"norm_log_f0 {r[1]:+.4f}  delta {r[2]:+.5f}  (flush)")
        emitted += 1
    print(f"total {emitted} frames "
          f"({emitted * pcfg.hop_ms / 1000.0:.2f} s of audio)")


if __name__ == "__main__":
    main()
