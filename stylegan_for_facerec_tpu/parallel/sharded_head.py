"""Partial-FC-style class-sharded margin softmax with EXPLICIT collectives.

Two implementations of the model-parallel classification head coexist:

  1. The pjit path (train/stage3.py): write global math, annotate the
     (batch, classes) logits with a ('data', 'model') sharding, and let
     XLA's SPMD partitioner insert the cross-shard collectives. Verified
     numerically identical to single-device execution.

  2. This module: the same computation spelled out under ``shard_map`` —
     each device holds a (num_classes/model, dim) weight shard, computes
     its local cosine-logit block, applies the margin on the shard that
     owns the target class, and the softmax cross-entropy reduces with
     explicit ``psum``/``pmax`` over the 'model' axis (the partial-FC
     recipe; replaces the reference's torch.chunk + .cuda(i) loop,
     ``head/metrics.py:104-113``).

(2) exists because explicit collectives make the comm pattern auditable
and immune to partitioner regressions; both are cross-checked in tests.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.heads import arcface_margin, cosface_margin


def _local_margin_ce(features, weight_shard, labels, *, num_classes,
                     kind, s, m, model_axis, data_axis):
    """Runs per-device under shard_map.

    features: (B_local, D) — sharded over data, replicated over model;
    weight_shard: (C_local, D); labels: (B_local,) global class ids.
    Returns (per-sample CE losses (B_local,), per-sample correct@1).
    """
    shard_idx = lax.axis_index(model_axis)
    c_local = weight_shard.shape[0]
    class_offset = shard_idx * c_local

    f = features / jnp.maximum(
        jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
    w = weight_shard / jnp.maximum(
        jnp.linalg.norm(weight_shard, axis=-1, keepdims=True), 1e-12)
    cosine = jnp.dot(f, w.T, preferred_element_type=jnp.float32)

    local_labels = labels - class_offset
    in_shard = (local_labels >= 0) & (local_labels < c_local)
    one_hot = jax.nn.one_hot(jnp.where(in_shard, local_labels, -1),
                             c_local, dtype=cosine.dtype)
    if kind == "arcface":
        logits = arcface_margin(cosine, one_hot, s, m)
    elif kind == "cosface":
        logits = cosface_margin(cosine, one_hot, s, m)
    else:
        logits = cosine * s

    # numerically-stable cross-shard softmax CE. The max shift cancels in
    # log-sum-exp, so stop_gradient is exact (pmax has no VJP anyway):
    local_max = lax.stop_gradient(jnp.max(logits, axis=1))
    gmax = lax.pmax(local_max, model_axis)
    exp = jnp.exp(logits - gmax[:, None])
    denom = lax.psum(jnp.sum(exp, axis=1), model_axis)
    target_logit = lax.psum(jnp.sum(logits * one_hot, axis=1), model_axis)
    ce = jnp.log(denom) + gmax - target_logit

    # top-1: global argmax via pmax of local max (id recovered per shard)
    local_arg = jnp.argmax(logits, axis=1) + class_offset
    is_global_max = local_max == gmax
    pred = lax.pmax(jnp.where(is_global_max, local_arg, -1), model_axis)
    correct = (pred == labels).astype(jnp.float32)
    return ce, correct


def make_sharded_margin_ce(mesh: Mesh, num_classes: int, kind: str =
                           "arcface", s: float = 64.0, m: float = 0.50,
                           data_axis: str = "data",
                           model_axis: str = "model"):
    """Returns fn(features, weight, labels) -> (mean CE, top1 acc) running
    under shard_map with weight sharded P(model, None) and the batch
    sharded P(data)."""
    n_model = mesh.shape[model_axis]
    assert num_classes % n_model == 0, (num_classes, n_model)

    kernel = functools.partial(
        _local_margin_ce, num_classes=num_classes, kind=kind, s=s, m=m,
        model_axis=model_axis, data_axis=data_axis)

    smapped = shard_map(
        kernel, mesh=mesh,
        in_specs=(P(data_axis, None), P(model_axis, None), P(data_axis)),
        out_specs=(P(data_axis), P(data_axis)),
        check_vma=False)

    def fn(features, weight, labels):
        ce, correct = smapped(features, weight, labels)
        return jnp.mean(ce), jnp.mean(correct)

    return fn
