"""Functional module core for the TPU-native stack.

Design: a *layer definition* is a lightweight static Python object (hashable
hyper-parameters only). Parameters and mutable state (BatchNorm running
statistics, EMA buffers, ...) live in plain nested-dict pytrees that the
caller owns and threads explicitly:

    params, state = layer.init(jax.random.key(0))
    y, new_state  = layer.apply(params, state, x, Ctx(train=True, rng=key))

This replaces the reference stack's implicit PyTorch module state (e.g. the
in-forward ``w_avg.copy_`` EMA update in
``/root/reference/backbone/stylegan2_ada/generator.py:275-276`` which is
unsafe under replication) with explicit, jit-friendly carried state.

Everything composes under ``jax.jit`` / ``pjit``: layer objects are static,
pytrees are traced.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

Params = Any  # nested dict of jnp arrays
State = Any   # nested dict of jnp arrays (may be {})


class Ctx:
    """Per-call context: train/eval mode and a threaded PRNG key.

    ``make_rng()`` deterministically derives fresh keys by fold-in of a
    Python-side counter; the side effect happens at trace time only, so the
    sequence is stable under jit.
    """

    __slots__ = ("train", "_key", "_count", "bn_groups", "shard_fn",
                 "quant")

    def __init__(self, train: bool = False, rng: Optional[jax.Array] = None,
                 bn_groups: Optional[int] = None, shard_fn=None,
                 quant=None):
        self.train = bool(train)
        self._key = rng
        self._count = 0
        # >1: BatchNorm layers normalize per contiguous batch group
        # (ghost BN — the SPMD emulation of DataParallel per-replica BN);
        # None/1: whole-batch statistics
        self.bn_groups = bn_groups
        # optional activation-sharding hook (parallel/spatial.py): models
        # that synthesize large spatial extents call it on per-block
        # activations so GSPMD partitions the convs (halo exchange)
        # instead of replicating the whole image per device. None = no-op.
        self.shard_fn = shard_fn
        # optional matmul-interception hook (utils/quantize.py): Conv2d /
        # Linear delegate their compute to quant.conv2d / quant.linear
        # when set. Calls are identified by trace-time call ORDER (the
        # same Python-side-counter idea as make_rng), so calibration,
        # weight quantization, and int8 serving line up without any
        # per-layer naming. None = normal f32/bf16 compute.
        self.quant = quant

    def make_rng(self) -> jax.Array:
        if self._key is None:
            raise ValueError("Ctx has no rng key but a layer requested one "
                             "(dropout/noise in train mode needs rng=...)")
        self._count += 1
        return jax.random.fold_in(self._key, self._count)

    def replace(self, **kw) -> "Ctx":
        rng = kw.get("rng", self._key)
        if "rng" not in kw and self._key is not None:
            # fork the stream: a derived Ctx sharing the parent's key
            # verbatim would regenerate the parent's exact make_rng()
            # sequence (correlated dropout/noise between branches)
            rng = self.make_rng()
        return Ctx(train=kw.get("train", self.train), rng=rng,
                   bn_groups=kw.get("bn_groups", self.bn_groups),
                   shard_fn=kw.get("shard_fn", self.shard_fn),
                   quant=kw.get("quant", self.quant))


class Layer:
    """Base class for layer definitions. Subclasses are usually frozen
    dataclasses so they hash/compare by hyper-parameters."""

    def init(self, key: jax.Array):
        raise NotImplementedError

    def apply(self, params: Params, state: State, x, ctx: Ctx):
        raise NotImplementedError

    # convenience for stateless single-tree usage
    def init_params(self, key):
        p, s = self.init(key)
        if s:
            raise ValueError(f"{self} is stateful; use .init()")
        return p

    def __call__(self, params, state, x, ctx):
        return self.apply(params, state, x, ctx)


@dataclasses.dataclass(frozen=True)
class Sequential(Layer):
    """Ordered container; children keyed '0','1',... to mirror the torch
    ``nn.Sequential`` naming used throughout the reference (simplifies the
    torch-checkpoint converter key mapping)."""

    layers: tuple

    def __init__(self, *layers):
        object.__setattr__(self, "layers", tuple(layers))

    def init(self, key):
        params, state = {}, {}
        keys = jax.random.split(key, max(len(self.layers), 1))
        for i, (lyr, k) in enumerate(zip(self.layers, keys)):
            p, s = lyr.init(k)
            if p:
                params[str(i)] = p
            if s:
                state[str(i)] = s
        return params, state

    def apply(self, params, state, x, ctx):
        # Invariant (all layers): apply returns new state with the SAME tree
        # structure as the input state, so the caller can swap it in under jit.
        new_state = {}
        for i, lyr in enumerate(self.layers):
            p = params.get(str(i), {})
            s = state.get(str(i), {})
            x, ns = lyr.apply(p, s, x, ctx)
            if s or ns:
                new_state[str(i)] = ns
        return x, new_state


class Lambda(Layer):
    """Stateless, parameterless function wrapper."""

    def __init__(self, fn):
        self.fn = fn

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        return self.fn(x), {}


def init_child(children: dict, key: jax.Array):
    """Init a dict of named child layers -> (params, state) nested by name."""
    params, state = {}, {}
    keys = jax.random.split(key, max(len(children), 1))
    for (name, lyr), k in zip(sorted(children.items()), keys):
        p, s = lyr.init(k)
        if p:
            params[name] = p
        if s:
            state[name] = s
    return params, state


def apply_model(layer: Layer, variables: dict, x, train: bool = False,
                rng: Optional[jax.Array] = None):
    """Single-dict convenience wrapper: variables = {'params':..., 'state':...}."""
    ctx = Ctx(train=train, rng=rng)
    y, new_state = layer.apply(variables["params"], variables.get("state", {}),
                               x, ctx)
    return y, {"params": variables["params"], "state": new_state}


def param_count(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def cast_floats(tree, dtype):
    """Cast floating-point leaves of a pytree to ``dtype`` (bf16 compute)."""
    def _cast(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x
    return jax.tree_util.tree_map(_cast, tree)
