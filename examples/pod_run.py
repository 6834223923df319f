"""Multi-host pod pattern (config 5): run the same script on every host.

Each host: initializes distributed JAX, takes its shard of the corpus
listing, extracts features for its shard (data stays host-local), and
participates in the global CMVN reduction (the only cross-host traffic
— three small vectors over DCN).

Single-host execution degrades gracefully (process_count == 1), so this
script also serves as the single-machine corpus driver:

    python examples/pod_run.py corpus_dir/ out_dir/
"""

import sys

from mfcc_tpu import FeatureConfig
from mfcc_tpu.parallel import dist
from mfcc_tpu.runner import RunnerOptions, run


def main():
    corpus, out = sys.argv[1], sys.argv[2]
    dist.initialize()                      # no-op off-pod
    cfg = FeatureConfig(cmvn=True).validate()
    rep = run(corpus, cfg, RunnerOptions(out_dir=out, batch_size=32))
    if dist.is_coordinator():
        print(rep.dump())


if __name__ == "__main__":
    main()
