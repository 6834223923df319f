"""Multi-host setup and per-host corpus sharding.

The reference's "other target that needs its own launcher" was a manual
RISC-V flow (SURVEY.md §2b); here it is the pod path: every host runs the
same program, ``jax.distributed.initialize`` wires the processes together,
the global mesh spans all chips, and each host reads only its own shard of
the corpus (data loading stays on local disk; DCN carries only CMVN stats).
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize multi-host JAX.  No-op for single-process runs.

    On TPU pods all arguments are discovered from the environment; args
    exist for explicit/CPU testing setups.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def host_shard(items: list, process_index: int | None = None,
               process_count: int | None = None) -> list:
    """Deterministic per-host shard of a corpus listing (strided split,
    balancing utterance order across hosts)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return items[pi::pc]


def is_coordinator() -> bool:
    return jax.process_index() == 0
