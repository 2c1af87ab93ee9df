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

import os
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


# -- multi-process SPMD (pod slices: >1 host, each seeing a subset of the
# chips). The reference never leaves one process (nn.DataParallel); the
# TPU-native scale-out is jax.distributed + a GLOBAL mesh over all
# processes' devices, with each process contributing its local slice of
# every batch. --------------------------------------------------------------

def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Idempotent ``jax.distributed.initialize``. Returns True when the
    runtime is (now) multi-process-initialized, False when running
    single-process. On real TPU pods all three args come from the
    environment automatically; explicit args are for CPU tests.

    Must run BEFORE any call that initializes the XLA backend — so the
    already-initialized check inspects jax's distributed state directly
    instead of calling ``jax.process_count()`` (which would itself
    initialize the backend and make a subsequent initialize fatal)."""
    from jax._src import distributed as _dist
    if _dist.global_state.client is not None:
        return True
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    except (RuntimeError, ValueError) as e:
        if "already initialized" in str(e):
            return True
        raise


def initialize_distributed_from_env() -> bool:
    """CLI hook: initialize multi-process jax when SGFR_COORDINATOR is
    set (with SGFR_NUM_PROCESSES / SGFR_PROCESS_ID — explicit CPU/test
    wiring), or SGFR_DISTRIBUTED=1 (TPU pod runtimes auto-detect all
    three). Returns whether this is a multi-process run."""
    coord = os.environ.get("SGFR_COORDINATOR")
    if coord:
        initialize_distributed(
            coordinator_address=coord,
            num_processes=int(os.environ["SGFR_NUM_PROCESSES"]),
            process_id=int(os.environ["SGFR_PROCESS_ID"]))
    elif os.environ.get("SGFR_DISTRIBUTED") == "1":
        initialize_distributed()
    return jax.process_count() > 1


def from_process_local(sharding: NamedSharding, array) -> jax.Array:
    """Assemble a GLOBAL jax.Array from this process's LOCAL slice of the
    batch (each process passes only the rows it loaded;
    ``jax.make_array_from_process_local_data`` places them on the local
    devices and stitches the global view). Works single-process too,
    where local == global."""
    return jax.make_array_from_process_local_data(sharding,
                                                  np.asarray(array))
