from . import mesh
from .mesh import (batch_sharding, class_sharded, logits_sharding, make_mesh,
                   replicated, shard_params)
from .spatial import make_spatial_synthesis, spatial_shard_fn

__all__ = ["mesh", "batch_sharding", "class_sharded", "logits_sharding",
           "make_mesh", "replicated", "shard_params",
           "make_spatial_synthesis", "spatial_shard_fn"]
