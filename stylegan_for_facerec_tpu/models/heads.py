"""Margin-softmax classification heads.

Numerics mirror ``/root/reference/head/metrics.py`` (ArcFace :66-140,
CosFace :143-198, SphereFace :200-277, Am_softmax :287-333, Softmax :12-63,
plus the extra heads :336-708). Contract: ``(features, labels) -> scaled
logits``; the training loss (focal CE) is applied on top.

Parallelism: the reference chunks the class weight across GPUs by hand
(``head/metrics.py:104-113``). Here every head exposes the same math as a
pure function of the (possibly sharded) weight; the class-parallel
cross-entropy that avoids materializing replicated logits lives in
``parallel/sharded_head.py`` and reuses ``margin_logits`` below.

Stateless heads keep the ``Layer`` protocol; SphereFace's iteration counter
(``head/metrics.py:237-238``, mutable attribute in torch) becomes explicit
carried state.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..nn import Layer, initializers


def _normalize(x, axis=-1, eps=1e-12):
    """F.normalize semantics: x / max(||x||, eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def cosine_logits(features: jax.Array, weight: jax.Array) -> jax.Array:
    """cos(theta) between L2-normalized features (N, D) and class weights
    (C, D) -> (N, C)."""
    f = _normalize(features, axis=-1)
    w = _normalize(weight, axis=-1)
    return jnp.dot(f, w.T, preferred_element_type=jnp.float32)


def arcface_margin(cosine: jax.Array, one_hot: jax.Array, s: float = 64.0,
                   m: float = 0.50, easy_margin: bool = False,
                   eps: float = 1e-10) -> jax.Array:
    """cos(theta + m) on the target class (``head/metrics.py:114-140``),
    with the reference's sine clamp to [eps, 1-eps] and the cos > th
    fallback to ``cos - m*sin(pi-m)``."""
    cos_m, sin_m = math.cos(m), math.sin(m)
    th = math.cos(math.pi - m)
    mm = math.sin(math.pi - m) * m
    sine = jnp.sqrt(jnp.clip(1.0 - jnp.square(cosine), eps, 1 - eps))
    phi = cosine * cos_m - sine * sin_m
    if easy_margin:
        phi = jnp.where(cosine > 0, phi, cosine)
    else:
        phi = jnp.where(cosine > th, phi, cosine - mm)
    return (one_hot * phi + (1.0 - one_hot) * cosine) * s


def cosface_margin(cosine: jax.Array, one_hot: jax.Array, s: float = 64.0,
                   m: float = 0.50) -> jax.Array:
    """cos(theta) - m (``head/metrics.py:166-191``)."""
    return (one_hot * (cosine - m) + (1.0 - one_hot) * cosine) * s


def margin_logits(kind: str, cosine: jax.Array, one_hot: jax.Array,
                  **kw) -> jax.Array:
    """Shared margin dispatch; works on full or class-sharded cosine
    blocks (one_hot must be the matching shard)."""
    if kind == "arcface":
        return arcface_margin(cosine, one_hot, **kw)
    if kind == "cosface":
        return cosface_margin(cosine, one_hot, **kw)
    if kind == "am_softmax":
        c = jnp.clip(cosine, -1, 1)
        s = kw.get("s", 30.0)
        m = kw.get("m", 0.35)
        return (jnp.where(one_hot > 0, c - m, c)) * s
    raise ValueError(kind)


@dataclasses.dataclass(frozen=True)
class SoftmaxHead(Layer):
    """Plain linear classifier (``head/metrics.py:12-46``)."""

    in_features: int
    out_features: int

    def init(self, key):
        kw, _ = jax.random.split(key)
        return {"weight": initializers.xavier_uniform(
            kw, (self.out_features, self.in_features), layout="oi"),
            "bias": jnp.zeros((self.out_features,))}, {}

    def apply(self, params, state, inputs, ctx):
        features, _labels = inputs
        return features @ params["weight"].T + params["bias"], {}


@dataclasses.dataclass(frozen=True)
class ArcFace(Layer):
    """``head/metrics.py:66-140``; weight (C, D) xavier-uniform."""

    in_features: int
    out_features: int
    s: float = 64.0
    m: float = 0.50
    easy_margin: bool = False
    eps: float = 1e-10

    def init(self, key):
        return {"weight": initializers.xavier_uniform(
            key, (self.out_features, self.in_features), layout="oi")}, {}

    def apply(self, params, state, inputs, ctx):
        features, labels = inputs
        cosine = cosine_logits(features, params["weight"])
        one_hot = jax.nn.one_hot(labels, self.out_features,
                                 dtype=cosine.dtype)
        out = arcface_margin(cosine, one_hot, self.s, self.m,
                             self.easy_margin, self.eps)
        return out, {}


@dataclasses.dataclass(frozen=True)
class CosFace(Layer):
    """``head/metrics.py:143-198``."""

    in_features: int
    out_features: int
    s: float = 64.0
    m: float = 0.50

    def init(self, key):
        return {"weight": initializers.xavier_uniform(
            key, (self.out_features, self.in_features), layout="oi")}, {}

    def apply(self, params, state, inputs, ctx):
        features, labels = inputs
        cosine = cosine_logits(features, params["weight"])
        one_hot = jax.nn.one_hot(labels, self.out_features,
                                 dtype=cosine.dtype)
        return cosface_margin(cosine, one_hot, self.s, self.m), {}


@dataclasses.dataclass(frozen=True)
class SphereFace(Layer):
    """cos(m*theta) with annealed lambda (``head/metrics.py:200-277``).
    The torch version mutates ``self.iter`` inside forward; here the
    counter is carried state."""

    in_features: int
    out_features: int
    m: int = 4
    base: float = 1000.0
    gamma: float = 0.12
    power: float = 1.0
    lambda_min: float = 5.0

    def init(self, key):
        p = {"weight": initializers.xavier_uniform(
            key, (self.out_features, self.in_features), layout="oi")}
        return p, {"iter": jnp.zeros((), jnp.int32)}

    def apply(self, params, state, inputs, ctx):
        features, labels = inputs
        it = state["iter"] + 1
        lamb = jnp.maximum(
            self.lambda_min,
            self.base * (1 + self.gamma * it.astype(jnp.float32))
            ** (-self.power))
        cos_t = jnp.clip(cosine_logits(features, params["weight"]), -1, 1)
        # Chebyshev duplication formula, m in 0..5 (static)
        mforms = [
            lambda x: x * 0 + 1,
            lambda x: x,
            lambda x: 2 * x ** 2 - 1,
            lambda x: 4 * x ** 3 - 3 * x,
            lambda x: 8 * x ** 4 - 8 * x ** 2 + 1,
            lambda x: 16 * x ** 5 - 20 * x ** 3 + 5 * x,
        ]
        cos_m_t = mforms[self.m](cos_t)
        theta = jnp.arccos(jnp.clip(cos_t, -1 + 1e-7, 1 - 1e-7))
        k = jnp.floor(self.m * theta / math.pi)
        phi = ((-1.0) ** k) * cos_m_t - 2 * k
        feat_norm = jnp.linalg.norm(features, axis=1, keepdims=True)
        one_hot = jax.nn.one_hot(labels, self.out_features,
                                 dtype=cos_t.dtype)
        out = (one_hot * (phi - cos_t) / (1 + lamb)) + cos_t
        return out * feat_norm, {"iter": it}


@dataclasses.dataclass(frozen=True)
class AmSoftmax(Layer):
    """``head/metrics.py:287-333``; kernel (D, C) with renorm init."""

    in_features: int
    out_features: int
    m: float = 0.35
    s: float = 30.0

    def init(self, key):
        k = jax.random.uniform(key, (self.in_features, self.out_features),
                               minval=-1.0, maxval=1.0)
        # torch: uniform_(-1,1).renorm_(2, dim=1, maxnorm=1e-5).mul_(1e5)
        # == columns L2-normalized (columns with norm < 1e-5 kept as-is)
        norms = jnp.linalg.norm(k, axis=0, keepdims=True)
        k = jnp.where(norms > 1e-5, k / norms, k * 1e5)
        return {"kernel": k}, {}

    def apply(self, params, state, inputs, ctx):
        features, labels = inputs
        kernel_norm = params["kernel"] / jnp.maximum(
            jnp.linalg.norm(params["kernel"], axis=0, keepdims=True), 1e-12)
        cos_t = jnp.clip(features @ kernel_norm, -1, 1)
        one_hot = jax.nn.one_hot(labels, self.out_features,
                                 dtype=cos_t.dtype)
        return margin_logits("am_softmax", cos_t, one_hot, s=self.s,
                             m=self.m), {}


@dataclasses.dataclass(frozen=True)
class AdaCos(Layer):
    """Adaptively scaling cosine logits (``head/metrics.py:336-368``).

    The torch version mutates ``self.scale`` every forward under no_grad:
    ``B_avg = sum(exp(scale_old * cos) over negatives) / B``,
    ``theta_med = median(theta[target])``, then
    ``scale_new = log(B_avg) / cos(min(pi/4, theta_med))`` — and the
    *returned* logits use the NEW scale. Here the scale is explicit
    carried state (initialized to ``sqrt(2) * log(C-1)``), updated under
    ``stop_gradient`` to match no_grad semantics.

    Note ``torch.median`` over an even-length vector returns the LOWER of
    the two middle elements (no interpolation); we sort and index
    ``(B-1)//2`` rather than use ``jnp.median`` to stay oracle-exact.
    """

    in_features: int
    out_features: int

    def init(self, key):
        params = {"weight": initializers.xavier_uniform(
            key, (self.out_features, self.in_features), layout="oi")}
        scale0 = math.sqrt(2) * math.log(self.out_features - 1)
        return params, {"scale": jnp.asarray(scale0, jnp.float32)}

    def apply(self, params, state, inputs, ctx):
        features, labels = inputs
        logits = cosine_logits(features, params["weight"])
        theta = jnp.arccos(jnp.clip(logits, -1.0 + 1e-7, 1.0 - 1e-7))
        one_hot = jax.nn.one_hot(labels, self.out_features,
                                 dtype=logits.dtype)
        b = features.shape[0]
        b_avg = jnp.sum(jnp.where(one_hot < 1,
                                  jnp.exp(state["scale"] * logits),
                                  jnp.zeros_like(logits))) / b
        target_theta = jnp.take_along_axis(
            theta, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
        theta_med = jnp.sort(target_theta)[(b - 1) // 2]
        scale_new = jax.lax.stop_gradient(
            jnp.log(b_avg) / jnp.cos(jnp.minimum(math.pi / 4, theta_med)))
        return scale_new * logits, {"scale": scale_new}


@dataclasses.dataclass(frozen=True)
class CurricularFace(Layer):
    """``head/metrics.py:475-509``: adaptive hard-negative weighting with
    an EMA ``t`` statistic (torch registered buffer -> carried state)."""

    in_features: int
    out_features: int
    s: float = 64.0
    m: float = 0.50

    def init(self, key):
        w = jax.random.normal(key, (self.out_features, self.in_features))
        w = w * 0.01
        return {"weight": w}, {"t": jnp.zeros(())}

    def apply(self, params, state, inputs, ctx):
        features, labels = inputs
        cos_m, sin_m = math.cos(self.m), math.sin(self.m)
        th = math.cos(math.pi - self.m)
        mm = math.sin(math.pi - self.m) * self.m
        cosine = cosine_logits(features, params["weight"])
        one_hot = jax.nn.one_hot(labels, self.out_features,
                                 dtype=cosine.dtype)
        target = jnp.sum(cosine * one_hot, axis=1, keepdims=True)
        sin_t = jnp.sqrt(jnp.clip(1.0 - target ** 2, 0, 1))
        cos_t_m = target * cos_m - sin_t * sin_m
        phi = jnp.where(target > th, cos_t_m, target - mm)
        # the reference updates t under torch.no_grad() (metrics.py:497);
        # stop_gradient blocks the extra grad path through the EMA statistic
        t_new = jax.lax.stop_gradient(
            0.99 * state["t"] + 0.01 * jnp.mean(target))
        hard = jnp.where(cosine > cos_t_m, cosine * (t_new + cosine), cosine)
        out = one_hot * phi + (1 - one_hot) * hard
        return out * self.s, {"t": t_new}


HEAD_REGISTRY = {
    "Softmax": SoftmaxHead,
    "ArcFace": ArcFace,
    "CosFace": CosFace,
    "SphereFace": SphereFace,
    "Am_softmax": AmSoftmax,
    "AdaCos": AdaCos,
    "CurricularFace": CurricularFace,
}


def build_head(name: str, in_features: int, out_features: int, **kw) -> Layer:
    """Factory mirroring train.py's HEAD_DICT (``train.py:178-181``)."""
    if name not in HEAD_REGISTRY:
        raise ValueError(f"unknown head {name!r}; have {list(HEAD_REGISTRY)}")
    return HEAD_REGISTRY[name](in_features, out_features, **kw)
