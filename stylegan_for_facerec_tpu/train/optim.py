"""Optimizers and LR schedules for the three training stages.

Stage-3 parity targets:
  * torch SGD(momentum=0.9, wd=2e-3) with BatchNorm params exempt from
    weight decay (``separate_irse_bn_paras``, ``util/utils.py:118-139``;
    ``train.py:195-196``)
  * linear per-batch warmup (``warm_up_lr``, ``util/utils.py:184-188``)
  * stage decay /1.5 at configured epochs (``schedule_lr``,
    ``util/utils.py:191-196``)
  * frozen-backbone epochs via gradient masks (``train.py:263-274``)

Stage-2 parity target: Ranger = RAdam + Lookahead(k=6, a=0.5) + gradient
centralization, betas (0.95, 0.999), eps 1e-5
(``restyle-encoder/training/ranger.py:29-163``) — lookahead slow weights
are explicit optimizer state.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax

from ..nn import BatchNorm, Layer
from ..utils.torch_convert import iter_children


def batchnorm_decay_mask(layer: Layer) -> Callable:
    """Build a fn(params) -> bool pytree: True = apply weight decay.
    BatchNorm params are exempt, everything else (convs, linears, PReLU)
    decays — matching ``separate_irse_bn_paras`` which splits by module
    class (``util/utils.py:118-139``)."""

    def collect_bn_paths(layer, prefix, acc):
        if isinstance(layer, BatchNorm):
            acc.add(prefix)
            return
        for name, child in iter_children(layer).items():
            collect_bn_paths(child, prefix + (name,), acc)

    def mask_fn(params, bn_paths, prefix=()):
        if not isinstance(params, dict):
            return not any(prefix[:len(p)] == p for p in bn_paths)
        return {k: mask_fn(v, bn_paths, prefix + (k,))
                for k, v in params.items()}

    bn_paths = set()
    collect_bn_paths(layer, (), bn_paths)

    def fn(params):
        return mask_fn(params, bn_paths)

    return fn


def sgd_torch(learning_rate, momentum: float = 0.9,
              weight_decay: float = 0.0, decay_mask=None):
    """Exact torch.optim.SGD semantics: g += wd*p; buf = m*buf + g;
    p -= lr*buf."""
    txs = []
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay, mask=decay_mask))
    if momentum:
        txs.append(optax.trace(decay=momentum, nesterov=False))
    txs.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*txs)


@dataclasses.dataclass(frozen=True)
class Stage3Schedule:
    """lr(step): linear warmup over ``warmup_batches`` then /1.5 at each
    stage boundary (epoch indices in ``stages``), mirroring
    ``train.py:254-296``: warmup is per-batch during the first
    NUM_EPOCH_WARM_UP epochs; the /1.5 decay applies from the first step
    of stage epoch ``s`` onward (``train.py:256`` runs ``schedule_lr`` at
    the top of the epoch, so ``epoch >= s`` is the reference
    semantics)."""

    base_lr: float = 0.03
    warmup_batches: int = 0
    steps_per_epoch: int = 1
    stages: Sequence[int] = ()
    decay_factor: float = 1.5

    def __call__(self, step):
        step = jnp.asarray(step)
        epoch = step // self.steps_per_epoch
        n_decays = jnp.sum(jnp.asarray(
            [(epoch >= s) for s in self.stages], jnp.int32)) \
            if self.stages else 0
        lr = self.base_lr / (self.decay_factor ** n_decays)
        if self.warmup_batches > 0:
            warm = self.base_lr * (step + 1) / self.warmup_batches
            lr = jnp.where(step < self.warmup_batches, warm, lr)
        return lr


def freeze_mask_for(layer: Layer, frozen_prefixes: Sequence[Sequence[str]],
                    params) -> dict:
    """0/1 float mask pytree zeroing gradients under any of the given path
    prefixes — the stage-3 freeze of ``encoder.body`` during the first
    FREEZE_BACKBONE_EPOCHS (``train.py:263-274``)."""
    prefixes = [tuple(p) for p in frozen_prefixes]

    def rec(node, prefix=()):
        if not isinstance(node, dict):
            frozen = any(prefix[:len(p)] == p for p in prefixes)
            return jnp.zeros((), jnp.float32) if frozen \
                else jnp.ones((), jnp.float32)
        return {k: rec(v, prefix + (k,)) for k, v in node.items()}

    return rec(params)


def apply_grad_mask(grads, mask):
    return jax.tree_util.tree_map(lambda g, m: g * m, grads, mask)


def add_decayed_weights_masked(grads, params, weight_decay, decay_mask,
                               grad_mask=None):
    """torch SGD's ``g += wd*p`` restricted to ``decay_mask`` (the BN
    exemption) and zeroed wherever ``grad_mask`` freezes a param.

    The reference freezes via ``requires_grad_(False)``
    (``train.py:263-274``): torch then skips the param entirely, so a
    frozen param receives NEITHER gradient NOR weight-decay updates.
    Applying the decay inside the optimizer chain would keep shrinking
    frozen params by lr*wd*p each step — over the 3 freeze epochs that
    would visibly erode the pretrained stage-2 encoder body."""
    out = jax.tree_util.tree_map(
        lambda g, p, dm: g + weight_decay * p if dm else g,
        grads, params, decay_mask)
    if grad_mask is not None:
        out = apply_grad_mask(out, grad_mask)
    return out


def increasing_layer_decay_mask(params, first_layer_lr: float = 0.0)\
        -> dict:
    """Per-layer LR scaling mask (``apply_increasing_layer_decay``,
    ``util/utils.py:372-396``): gradient hooks in torch become a static
    multiplier pytree here. 'weight' leaves are counted in tree order;
    each weight/bias leaf gets ratio first_layer_lr + depth_fraction *
    (1 - first_layer_lr) — early layers learn slower."""
    leaves = []

    def collect(node, prefix=()):
        if isinstance(node, dict):
            for k in node:
                collect(node[k], prefix + (k,))
        else:
            leaves.append(prefix)

    collect(params)
    n_weights = sum(1 for p in leaves if p and p[-1] == "weight")
    ratios = {}
    cur = 0
    for p in leaves:
        if p and p[-1] == "weight":
            cur += 1
        if p and p[-1] in ("weight", "bias") and n_weights:
            ratios[p] = first_layer_lr + cur / n_weights \
                * (1.0 - first_layer_lr)
        else:
            ratios[p] = 1.0

    def build(node, prefix=()):
        if isinstance(node, dict):
            return {k: build(v, prefix + (k,)) for k, v in node.items()}
        return jnp.asarray(ratios[prefix], jnp.float32)

    return build(params)


# ---------------------------------------------------------------------------
# Ranger (stage 2): RAdam + Lookahead + gradient centralization
# ---------------------------------------------------------------------------

def gradient_centralization(use_gc_conv_only: bool = False):
    """GC operator from ranger.py:100-102,124-127: subtract the grad mean
    over all dims but the OUTPUT dim for tensors with ndim > (3 if
    conv-only else 1). Layout assumptions: 4-D kernels are HWIO (out
    LAST -> mean over dims 0-2); 2-D weights are (out, in) torch layout
    (mean over dim 1) — true for every dense layer Ranger trains in this
    stack (``EqualLinear``, ADA ``FullyConnectedLayer``). ``nn.Linear``
    stores (in, out) and is only trained by the stage-3 SGD path, which
    does not use GC; route such weights through Ranger only with care."""
    thresh = 3 if use_gc_conv_only else 1

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def gc(g):
            if g.ndim > thresh:
                if g.ndim == 4:   # HWIO conv kernel: out axis is last
                    axes = tuple(range(3))
                else:             # dense (in,out)/(out,in): all but first
                    axes = tuple(range(1, g.ndim))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g
        return jax.tree_util.tree_map(gc, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def lookahead(k: int = 6, alpha: float = 0.5):
    """Lookahead wrapper (ranger.py:104-106,152-163): every k steps the
    slow weights move toward the fast weights by alpha, and the fast
    weights are reset to the slow ones. Implemented as a final optax
    transform over *updates*: we carry slow params explicitly."""

    def init_fn(params):
        return {"slow": jax.tree_util.tree_map(jnp.asarray, params),
                "count": jnp.zeros((), jnp.int32)}

    def update_fn(updates, state, params):
        count = state["count"] + 1
        sync = (count % k) == 0

        def blend(u, p, s):
            fast = p + u                     # fast weights after this step
            new_slow = s + alpha * (fast - s)
            # when syncing, the delivered update moves params to new_slow
            return jnp.where(sync, new_slow - p, u)

        def new_slow_leaf(u, p, s):
            fast = p + u
            return jnp.where(sync, s + alpha * (fast - s), s)

        new_updates = jax.tree_util.tree_map(blend, updates, params,
                                             state["slow"])
        new_slow = jax.tree_util.tree_map(new_slow_leaf, updates, params,
                                          state["slow"])
        return new_updates, {"slow": new_slow, "count": count}

    return optax.GradientTransformation(init_fn, update_fn)


def radam_torch(learning_rate, b1=0.95, b2=0.999, eps=1e-5,
                weight_decay=0.0):
    """RAdam with ranger.py's defaults (betas (0.95, 0.999), eps 1e-5)."""
    txs = []
    txs.append(optax.scale_by_radam(b1=b1, b2=b2, eps=eps))
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*txs)


def ranger(learning_rate, b1=0.95, b2=0.999, eps=1e-5, weight_decay=0.0,
           k=6, alpha=0.5, use_gc=True, gc_conv_only=False):
    """Full Ranger: GC -> RAdam -> lookahead (ranger.py:29-163)."""
    txs = []
    if use_gc:
        txs.append(gradient_centralization(gc_conv_only))
    txs.append(optax.scale_by_radam(b1=b1, b2=b2, eps=eps))
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_learning_rate(learning_rate))
    txs.append(lookahead(k=k, alpha=alpha))
    return optax.chain(*txs)
