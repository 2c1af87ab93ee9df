"""Device mesh / sharding helpers.

The reference's parallelism is single-process ``nn.DataParallel`` plus a
hand-chunked model-parallel classification head (SURVEY.md §2.7;
``train.py:219-222``, ``head/metrics.py:104-113``). TPU-native replacement:
one ``jax.sharding.Mesh`` with a ``data`` axis (batch / DP) and a ``model``
axis (class-sharded margin head / TP). Gradient all-reduce, the cross-shard
softmax reductions, and logit re-layout are all inserted by XLA's SPMD
partitioner from sharding annotations — collectives ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over ``devices`` (default: all)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def class_sharded(mesh: Mesh) -> NamedSharding:
    """Shard a (num_classes, dim) head weight over 'model' — the TP layout
    replacing the reference's torch.chunk head split."""
    return NamedSharding(mesh, P("model", None))


def shard_params(mesh: Mesh, params, head_path: str = "head"):
    """Place a train-state pytree: everything replicated except the margin
    head's class-dim-sharded weight(s) under ``params[head_path]``."""
    rep = replicated(mesh)
    cls = class_sharded(mesh)

    def place(path, x):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        x = jax.device_put(x, cls if (head_path in names and
                                      np.ndim(x) == 2) else rep)
        return x

    return jax.tree_util.tree_map_with_path(place, params)


def logits_sharding(mesh: Mesh) -> NamedSharding:
    """(batch, classes) block layout: batch over 'data', classes over
    'model'."""
    return NamedSharding(mesh, P("data", "model"))
