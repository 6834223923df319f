"""A/B: log-mel-80 at a 50 dB dynamic-range window, v3 raw (split) vs
v5 merged raw-DIT — the routing evidence for models/mfcc.py's use_dit
condition."""
import json, statistics, time
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from mfcc_tpu import FeatureConfig, oracle
from mfcc_tpu.ops.kernels import fused_raw, fused_raw_dit

cfg = FeatureConfig(n_mels=80, dynamic_range_db=50.0).validate()
B, sec, SCAN, ITERS, REPS = 64, 10.0, 20, 5, 5
n = int(sec * 16000)
rng = np.random.default_rng(0)
t = np.arange(n) / 16000
base = (0.3*np.sin(2*np.pi*180*t) + 0.1*np.sin(2*np.pi*1200*t)).astype(np.float32)
audio = np.tile(base, (B, 1)) + 0.02*rng.standard_normal((B, n)).astype(np.float32)
ad = jax.device_put(jnp.asarray(audio))
want = oracle.log_mel(audio[0].astype(np.float64), cfg)

def run(name, fn):
    got = np.asarray(jax.jit(fn)(ad)[0])
    err = float(np.abs(got[:want.shape[0], :want.shape[1]] - want).max())
    def g():
        def body(c, _):
            out = fn(ad + c)
            return (out.ravel()[0]*jnp.float32(1e-30)).astype(ad.dtype), None
        c, _ = jax.lax.scan(body, jnp.zeros((), ad.dtype), None, length=SCAN)
        return c
    gj = jax.jit(g); np.asarray(gj())
    reps = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS): out = gj()
        np.asarray(out)
        reps.append(B*sec*SCAN*ITERS/(time.perf_counter()-t0))
    r = {"mode": name, "median": round(statistics.median(reps),1),
         "reps": [round(x,1) for x in reps], "max_abs_err_50db": err}
    print(json.dumps(r), flush=True)
    return r

res = [run("v3-raw-split", lambda x: fused_raw.fused_features_raw(x, cfg, apply_dct=False)),
       run("v5-raw-dit-merged", lambda x: fused_raw_dit.fused_features_raw_dit(x, cfg, apply_dct=False, merged=True))]
json.dump({"config": "logmel80 @50dB window", "batch": B, "protocol": "scan-carry-v2",
           "results": {r["mode"]: r for r in res}}, open("/tmp/ab_logmel50.json","w"), indent=1)
