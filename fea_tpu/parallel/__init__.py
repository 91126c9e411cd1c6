"""Multi-device parallelism (SURVEY.md §2 'Parallel components the new
framework must introduce' — all absent from the single-process reference).

Two orthogonal axes:

  * domain decomposition (``shard_operator``): elements partitioned
    across devices; shared-node force partials combined with
    ``lax.psum`` over the ICI mesh — the FEA analog of tensor/sequence
    parallelism.
  * batch/sweep parallelism (``sharded_sweep``): independent load cases
    sharded across devices — the FEA analog of data parallelism.
"""
from .sharding import (  # noqa: F401
    ShardedOperator,
    make_device_mesh,
    shard_curvilinear,
    shard_extruded,
    shard_operator,
    shard_structured_operator,
    sharded_sweep,
)

__all__ = [
    "make_device_mesh",
    "shard_curvilinear",
    "shard_extruded",
    "shard_operator",
    "ShardedOperator",
    "sharded_sweep",
    "shard_structured_operator",
]
