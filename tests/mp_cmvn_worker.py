"""Worker for the two-process distributed CMVN integration test.

Each process: initializes jax.distributed, takes its host shard of the
corpus, extracts features locally, contributes them to a globally
sharded array, and computes corpus CMVN statistics with the same
batch_stats code used in production — the reduction crosses process
boundaries.  Process 0 validates against the float64 oracle and writes
a sentinel file the pytest side asserts on.

Usage: python mp_cmvn_worker.py <proc_id> <port> <corpus_dir> <out_dir> [nproc]
"""

import sys
import os

proc_id = int(sys.argv[1])
port = sys.argv[2]
corpus, out_dir = sys.argv[3], sys.argv[4]
nproc = int(sys.argv[5]) if len(sys.argv) > 5 else 2

import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=proc_id)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mfcc_tpu import FeatureConfig, oracle
from mfcc_tpu.models import mfcc as mfcc_model
from mfcc_tpu.parallel import cmvn, dist
from mfcc_tpu.utils import wav

cfg = FeatureConfig()
paths = sorted(os.path.join(corpus, f) for f in os.listdir(corpus)
               if f.endswith(".wav"))
mine = dist.host_shard(paths)
assert len(mine) > 0 and jax.process_count() == nproc

# local decode + pad (4 rows per process -> global batch of 4*nproc)
PAD = 16000
B_LOCAL = 4
audio = np.zeros((B_LOCAL, PAD), np.float32)
lengths = np.zeros((B_LOCAL,), np.int32)
for i, p in enumerate(mine[:B_LOCAL]):
    x, sr = wav.read_wav(p)
    L = min(len(x), PAD)
    audio[i, :L] = x[:L]
    lengths[i] = L

feat, flens, mask = mfcc_model.mfcc_batch_jit(
    jnp.asarray(audio), jnp.asarray(lengths), cfg)

# build globally sharded feature/mask arrays from per-process shards
mesh = Mesh(np.array(jax.devices()), ("data",))
gshape_f = (nproc * B_LOCAL,) + tuple(feat.shape[1:])
gshape_m = (nproc * B_LOCAL,) + tuple(mask.shape[1:])
gf = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.asarray(feat), gshape_f)
gm = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.asarray(mask), gshape_m)

stats = jax.jit(cmvn.batch_stats)(gf, gm)   # global cross-process reduction
count = float(stats.count)
ssum = np.asarray(stats.sum)

if proc_id == 0:
    # oracle over the SAME utterances every process contributed
    feats64 = []
    for shard in (dist.host_shard(paths, r, nproc)[:B_LOCAL]
                  for r in range(nproc)):
        for p in shard:
            x, _ = wav.read_wav(p)
            feats64.append(oracle.mfcc(x[:PAD].astype(np.float64), cfg))
    c, s, sq = oracle.cmvn_stats(feats64)
    assert count == c, (count, c)
    np.testing.assert_allclose(ssum, s, rtol=1e-4, atol=1e-2)
    with open(os.path.join(out_dir, "mp_ok"), "w") as f:
        f.write(f"count={count}\n")
print(f"proc {proc_id} done; global frame count {count}", flush=True)
