"""Device-mesh construction and sharding helpers (pjit over ICI)."""

from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
    shard_params,
)
