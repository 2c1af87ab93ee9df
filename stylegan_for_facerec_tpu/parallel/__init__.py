from . import mesh
from .mesh import (batch_sharding, class_sharded, logits_sharding, make_mesh,
                   replicated, shard_params)

__all__ = ["mesh", "batch_sharding", "class_sharded", "logits_sharding",
           "make_mesh", "replicated", "shard_params"]
