"""Worker for the two-process runner-level e2e test (VERDICT r1 #4).

Each process: jax.distributed init, then the PRODUCTION runner.run on the
shared corpus — host-sharding, local-device compute, per-host writers and
manifests, and the cross-process float64 CMVN reduction all exercised
exactly as a real multi-host job would.

Usage: python mp_runner_worker.py <proc_id> <port> <corpus> <out_dir> [nproc]
"""

import sys

proc_id = int(sys.argv[1])
port = sys.argv[2]
corpus, out_dir = sys.argv[3], sys.argv[4]
nproc = int(sys.argv[5]) if len(sys.argv) > 5 else 2
pack = len(sys.argv) > 6 and sys.argv[6] == 'pack'

import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=proc_id)

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mfcc_tpu import FeatureConfig, runner

cfg = FeatureConfig(cmvn=True).validate()
rep = runner.run(corpus, cfg, runner.RunnerOptions(
    out_dir=out_dir, batch_size=2, pack=pack, pack_seconds=2.0))
assert rep.n_hosts == nproc, rep.n_hosts
assert rep.n_utterances > 0
print(f"proc {proc_id}: {rep.n_utterances} utts, "
      f"{rep.audio_seconds:.2f} audio-sec", flush=True)
