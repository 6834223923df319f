"""Multi-chip / multi-host execution (SURVEY.md §2b, §5).

The reference has no parallelism of any kind (SURVEY.md §2a); everything
here is mandated by the project north star: data parallelism over
utterances via ``jax.sharding`` meshes, global CMVN statistics via
collectives riding ICI/DCN, and multi-host process setup.

- :mod:`mesh` — device mesh + NamedSharding helpers
- :mod:`cmvn` — masked feature statistics, tree-merge, global reduction
- :mod:`dist` — ``jax.distributed`` initialization, per-host corpus shards
"""

from . import mesh, cmvn, dist  # noqa: F401
