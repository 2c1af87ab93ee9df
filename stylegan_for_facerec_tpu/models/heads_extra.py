"""Extra margin heads — the full zoo beyond train.py's HEAD_DICT.

Parity targets in ``/root/reference/head/metrics.py``: AM_Softmax (:371),
ArcNegFace (:394), CircleLoss (:435), MagFace (:512), MV_Softmax (:555),
NPCFace (:592), SST_Prototype (:638-708). All torch in-place scatter /
boolean-index tricks become masked ``where``s; buffers and queue cursors
become carried state.
"""

from __future__ import annotations

import dataclasses
import math
import jax
import jax.numpy as jnp

from ..nn import Layer


def _renorm_init(key, shape, axis):
    """torch ``uniform_(-1,1).renorm_(2, dim, 1e-5).mul_(1e5)`` == unit-norm
    columns/rows along ``axis``."""
    k = jax.random.uniform(key, shape, minval=-1.0, maxval=1.0)
    n = jnp.linalg.norm(k, axis=axis, keepdims=True)
    return jnp.where(n > 1e-5, k / n, k * 1e5)


def _normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True),
                           eps)


def _one_hot(labels, n, dtype):
    return jax.nn.one_hot(labels, n, dtype=dtype)


@dataclasses.dataclass(frozen=True)
class AMSoftmaxV2(Layer):
    """``AM_Softmax`` (:371-392): weight (D, C), s=32 m=0.35."""

    feat_dim: int
    num_class: int
    margin: float = 0.35
    scale: float = 32.0

    def init(self, key):
        return {"weight": _renorm_init(
            key, (self.feat_dim, self.num_class), axis=0)}, {}

    def apply(self, params, state, inputs, ctx):
        feats, labels = inputs
        w = _normalize(params["weight"], axis=0)
        cos = jnp.clip(_normalize(feats) @ w, -1, 1)
        oh = _one_hot(labels, self.num_class, cos.dtype)
        return jnp.where(oh > 0, cos - self.margin, cos) * self.scale, {}


@dataclasses.dataclass(frozen=True)
class ArcNegFace(Layer):
    """``ArcNegFace`` (:394-433): arc margin on the target plus a detached
    Gaussian re-weighting of negatives around the target logit."""

    feat_dim: int
    num_class: int
    margin: float = 0.5
    scale: float = 64.0
    alpha: float = 1.2
    sigma: float = 2.0

    def init(self, key):
        stdv = 1.0 / math.sqrt(self.feat_dim)
        w = jax.random.uniform(key, (self.num_class, self.feat_dim),
                               minval=-stdv, maxval=stdv)
        return {"weight": w}, {}

    def apply(self, params, state, inputs, ctx):
        feats, labels = inputs
        thresh = math.cos(math.pi - self.margin)
        mm = math.sin(math.pi - self.margin) * self.margin
        cos = _normalize(feats) @ _normalize(params["weight"]).T
        oh = _one_hot(labels, self.num_class, cos.dtype)
        target = jnp.sum(cos * oh, axis=1, keepdims=True)
        a_t = jnp.where(target > thresh,
                        jnp.cos(jnp.arccos(jnp.clip(target, -1, 1))
                                + self.margin),
                        target - mm)
        reweight = self.alpha * jnp.exp(
            -jnp.square(cos - jax.lax.stop_gradient(a_t)) / self.sigma)
        t_scale = jax.lax.stop_gradient(reweight)
        out = oh * a_t + (1 - oh) * (t_scale * cos + t_scale - 1)
        return self.scale * out, {}


@dataclasses.dataclass(frozen=True)
class CircleLoss(Layer):
    """``CircleLoss`` (:435-473), classification form."""

    feat_dim: int
    num_class: int
    margin: float = 0.25
    gamma: float = 256.0

    def init(self, key):
        return {"weight": _renorm_init(
            key, (self.feat_dim, self.num_class), axis=0)}, {}

    def apply(self, params, state, inputs, ctx):
        feats, labels = inputs
        m = self.margin
        cos = jnp.clip(_normalize(feats)
                       @ _normalize(params["weight"], axis=0), -1, 1)
        oh = _one_hot(labels, self.num_class, cos.dtype)
        sg = jax.lax.stop_gradient(cos)
        alpha_p = jnp.maximum((1 + m) - sg, 0.0)
        alpha_n = jnp.maximum(sg - (-m), 0.0)
        logit_p = alpha_p * (cos - (1 - m))
        logit_n = alpha_n * (cos - m)
        return (oh * logit_p + (1 - oh) * logit_n) * self.gamma, {}


@dataclasses.dataclass(frozen=True)
class MagFace(Layer):
    """``MagFace`` (:512-553): magnitude-adaptive margin; returns
    (logits, g_regularizer)."""

    feat_dim: int
    num_class: int
    margin_am: float = 0.0
    scale: float = 32.0
    l_a: float = 10.0
    u_a: float = 110.0
    l_margin: float = 0.45
    u_margin: float = 0.8
    lamda: float = 20.0

    def init(self, key):
        return {"weight": _renorm_init(
            key, (self.feat_dim, self.num_class), axis=0)}, {}

    def apply(self, params, state, inputs, ctx):
        feats, labels = inputs
        x_norm = jnp.clip(jnp.linalg.norm(feats, axis=1, keepdims=True),
                          self.l_a, self.u_a)
        ada_m = (self.u_margin - self.l_margin) / (self.u_a - self.l_a) \
            * (x_norm - self.l_a) + self.l_margin
        cos_m, sin_m = jnp.cos(ada_m), jnp.sin(ada_m)
        loss_g = x_norm / (self.u_a ** 2) + 1.0 / x_norm
        cos = jnp.clip(_normalize(feats)
                       @ _normalize(params["weight"], axis=0), -1, 1)
        sin = jnp.sqrt(jnp.clip(1.0 - jnp.square(cos), 0, 1))
        cos_t_m = cos * cos_m - sin * sin_m
        min_cos = jnp.cos(math.pi - ada_m)
        cos_t_m = jnp.where(cos > min_cos, cos_t_m, cos - self.margin_am)
        oh = _one_hot(labels, self.num_class, cos.dtype)
        out = jnp.where(oh > 0, cos_t_m, cos) * self.scale
        return (out, self.lamda * loss_g), {}


@dataclasses.dataclass(frozen=True)
class MVSoftmax(Layer):
    """``MV_Softmax`` (:555-590): mis-classified-vector re-weighting."""

    feat_dim: int
    num_class: int
    is_am: bool = False
    margin: float = 0.35
    mv_weight: float = 1.12
    scale: float = 32.0

    def init(self, key):
        return {"weight": _renorm_init(
            key, (self.feat_dim, self.num_class), axis=0)}, {}

    def apply(self, params, state, inputs, ctx):
        feats, labels = inputs
        cos = _normalize(feats) @ _normalize(params["weight"], axis=0)
        oh = _one_hot(labels, self.num_class, cos.dtype)
        gt = jnp.sum(cos * oh, axis=1, keepdims=True)
        if self.is_am:
            mask = cos > gt - self.margin
            final_gt = jnp.where(gt > self.margin, gt - self.margin, gt)
        else:
            cos_m = math.cos(self.margin)
            sin_m = math.sin(self.margin)
            sin_t = jnp.sqrt(jnp.clip(1.0 - jnp.square(gt), 0, 1))
            cos_t_m = gt * cos_m - sin_t * sin_m
            mask = cos > cos_t_m
            final_gt = jnp.where(gt > 0.0, cos_t_m, gt)
        hard = self.mv_weight * cos + self.mv_weight - 1.0
        out = jnp.where(mask, hard, cos)
        out = jnp.where(oh > 0, final_gt, out)
        return out * self.scale, {}


@dataclasses.dataclass(frozen=True)
class NPCFace(Layer):
    """``NPCFace`` (:592-636): negative-positive cooperation margin."""

    feat_dim: int = 512
    num_class: int = 86876
    margin: float = 0.5
    scale: float = 64.0
    m0: float = 0.40
    m1: float = 0.20
    t: float = 1.10
    a: float = 0.20

    def init(self, key):
        return {"kernel": _renorm_init(
            key, (self.feat_dim, self.num_class), axis=0)}, {}

    def apply(self, params, state, inputs, ctx):
        feats, labels = inputs
        cos = jnp.clip(_normalize(feats)
                       @ _normalize(params["kernel"], axis=0), -1, 1)
        oh = _one_hot(labels, self.num_class, cos.dtype)
        gt = jnp.sum(cos * oh, axis=1, keepdims=True)
        sin_t = jnp.sqrt(jnp.clip(1.0 - jnp.square(gt), 0, 1))
        cos_t_m = gt * math.cos(self.margin) - sin_t * math.sin(self.margin)
        hard_mask = jax.lax.stop_gradient(
            ((cos > cos_t_m).astype(cos.dtype)) * (1 - oh))
        sum_hard = jnp.sum(cos * hard_mask, axis=1, keepdims=True)
        cnt_hard = jnp.clip(jnp.sum(hard_mask, axis=1, keepdims=True), 1,
                            self.num_class)
        avg_hard = jax.lax.stop_gradient(sum_hard / cnt_hard)
        newm = self.m0 + self.m1 * avg_hard
        final_gt = jnp.where(gt > 0,
                             gt * jnp.cos(newm) - sin_t * jnp.sin(newm), gt)
        out = jnp.where(cos > cos_t_m, self.t * cos + self.a, cos)
        out = jnp.where(oh > 0, final_gt, out)
        return out * self.scale, {}


@dataclasses.dataclass(frozen=True)
class SSTPrototype(Layer):
    """``SST_Prototype`` (:638-708): queue-based semi-siamese prototypes.
    The torch buffer queue + python cursor become carried state; the
    random queue-update branch threads the Ctx rng.

    apply() inputs: (p1, g2, p2, g1, cur_ids); returns
    ((logits1, logits2, label), state)."""

    feat_dim: int = 512
    queue_size: int = 16384
    scale: float = 30.0
    loss_type: str = "softmax"     # softmax | am_softmax | arc_softmax
    margin: float = 0.0

    def init(self, key):
        q = _renorm_init(key, (self.feat_dim, self.queue_size), axis=0)
        q = _normalize(q, axis=0)
        return {}, {"queue": q,
                    "index": jnp.zeros((), jnp.int32),
                    "labels": jnp.full((self.queue_size,), -1, jnp.int32)}

    def _add_margin(self, cos, labels):
        cos = jnp.clip(cos, -1, 1)
        oh = _one_hot(labels, self.queue_size, cos.dtype)
        gt = jnp.sum(cos * oh, axis=1, keepdims=True)
        if self.loss_type == "am_softmax":
            return jnp.where(oh > 0, gt - self.margin, cos)
        if self.loss_type == "arc_softmax":
            sin_t = jnp.sqrt(jnp.clip(1.0 - jnp.square(gt), 0, 1))
            gt_m = gt * math.cos(self.margin) - sin_t * math.sin(self.margin)
            return jnp.where(oh > 0, gt_m, cos)
        return cos

    def apply(self, params, state, inputs, ctx):
        p1, g2, p2, g1, cur_ids = inputs
        p1, g2 = _normalize(p1), jax.lax.stop_gradient(_normalize(g2))
        p2, g1 = _normalize(p2), jax.lax.stop_gradient(_normalize(g1))
        bs = p1.shape[0]
        idx = state["index"]
        # mod-indexed columns: the reference's slice assignment
        # (metrics.py:677) requires queue_size % bs == 0 and raises
        # otherwise; wrapping keeps labels and written columns in sync
        # for any batch size (a clamped dynamic_update_slice would
        # silently desynchronize them)
        cols = (idx + jnp.arange(bs)) % self.queue_size
        label = cols

        def theta(p, g):
            q = state["queue"].at[:, cols].set(g.T)
            cos = p @ jax.lax.stop_gradient(q)
            return self._add_margin(cos, label) * self.scale

        out1 = theta(p1, g2)
        out2 = theta(p2, g1)

        pick_g1 = jax.random.bernoulli(ctx.make_rng(), 0.5)
        g_sel = jnp.where(pick_g1, g1, g2)
        new_queue = state["queue"].at[:, cols].set(g_sel.T)
        new_labels = state["labels"].at[cols].set(cur_ids.astype(jnp.int32))
        new_state = {"queue": new_queue,
                     "index": (idx + bs) % self.queue_size,
                     "labels": new_labels}
        return (out1, out2, label), new_state
