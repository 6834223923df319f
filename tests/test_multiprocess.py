"""True multi-process distributed test (config 5, process level).

Spawns TWO separate Python processes that wire up via
``jax.distributed.initialize`` (TCP coordinator — the same mechanism as
a real multi-host pod, with CPU devices standing in for chips), each
extracting features for its host shard and participating in the global
CMVN reduction.  This covers what the fake-pod (single-process 8-device)
tests cannot: process-boundary collectives and host-shard data flow.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from mfcc_tpu.utils import wav


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_global_cmvn(tmp_path, rng):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for i in range(8):
        x = (rng.standard_normal(12000) * 0.3).astype(np.float32)
        wav.write_wav(corpus / f"u{i}.wav", x, 16000)

    worker = os.path.join(os.path.dirname(__file__), "mp_cmvn_worker.py")
    port = _free_port()
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port), str(corpus),
         str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]
    assert (tmp_path / "mp_ok").exists(), outs[0][-2000:]
