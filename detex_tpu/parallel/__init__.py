"""Device-mesh and sharding utilities."""

from detex_tpu.parallel.mesh import (make_mesh, replicated, shard_batch,
                                     with_sharding)

__all__ = ["make_mesh", "shard_batch", "replicated", "with_sharding"]
