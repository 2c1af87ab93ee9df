"""Core neural-net layers, NHWC / TPU-native.

Numerics deliberately mirror the torch layers used by the reference stack
(see file:line citations per class) so that converted pretrained weights
produce identical outputs; layouts do NOT mirror torch — activations are
NHWC and conv kernels HWIO, the layouts XLA tiles best onto the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from . import initializers as init
from .core import Ctx, Layer

IntPair = Union[int, Tuple[int, int]]


def _pair(v: IntPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


# ---------------------------------------------------------------------------
# Dense / Conv
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Linear(Layer):
    """Dense layer; weight stored (in, out). Parity with torch ``nn.Linear``
    (transpose of torch's (out, in)); init xavier-uniform + zero bias as in
    ``/root/reference/backbone/model_irse.py:186-189``."""

    in_features: int
    out_features: int
    use_bias: bool = True
    init_mode: str = "xavier"   # 'xavier' | 'torch_default'

    def init(self, key):
        kw, kb = jax.random.split(key)
        shape = (self.in_features, self.out_features)
        if self.init_mode == "xavier":
            w = init.xavier_uniform(kw, shape, layout="io")
            b = jnp.zeros((self.out_features,))
        else:
            w = init.kaiming_uniform(kw, shape, layout="io")
            b = init.uniform_fanin_bias(kb, (self.out_features,),
                                        self.in_features)
        p = {"weight": w}
        if self.use_bias:
            p["bias"] = b
        return p, {}

    def apply(self, params, state, x, ctx):
        if ctx.quant is not None:
            return ctx.quant.linear(self, params, x), {}
        # cast params to the activation dtype (as Conv2d does): f32 bias +
        # bf16 activations would silently promote everything downstream
        # to f32, breaking the bf16-compute/f32-params split
        y = jnp.dot(x, params["weight"].astype(x.dtype),
                    preferred_element_type=x.dtype)
        if self.use_bias:
            y = y + params["bias"].astype(x.dtype)
        return y, {}


@dataclasses.dataclass(frozen=True)
class Conv2d(Layer):
    """2-D convolution, NHWC x HWIO -> NHWC.

    Parity with torch ``nn.Conv2d`` (cross-correlation); xavier-uniform init
    and zero bias per the reference's ``_initialize_weights``
    (``/root/reference/backbone/model_irse.py:174-179``).
    """

    in_channels: int
    out_channels: int
    kernel_size: IntPair
    stride: IntPair = 1
    padding: IntPair = 0
    use_bias: bool = True
    groups: int = 1
    init_mode: str = "xavier"

    def init(self, key):
        kh, kw = _pair(self.kernel_size)
        kw_key, kb_key = jax.random.split(key)
        shape = (kh, kw, self.in_channels // self.groups, self.out_channels)
        if self.init_mode == "xavier":
            w = init.xavier_uniform(kw_key, shape, layout="hwio")
            b = jnp.zeros((self.out_channels,))
        else:
            w = init.kaiming_uniform(kw_key, shape, layout="hwio")
            fan_in = shape[0] * shape[1] * shape[2]
            b = init.uniform_fanin_bias(kb_key, (self.out_channels,), fan_in)
        p = {"weight": w}
        if self.use_bias:
            p["bias"] = b
        return p, {}

    def apply(self, params, state, x, ctx):
        if ctx.quant is not None:
            return ctx.quant.conv2d(self, params, x), {}
        ph, pw = _pair(self.padding)
        y = lax.conv_general_dilated(
            x, params["weight"].astype(x.dtype),
            window_strides=_pair(self.stride),
            padding=[(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
            preferred_element_type=x.dtype,
        )
        if self.use_bias:
            y = y + params["bias"].astype(x.dtype)
        return y, {}


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BatchNorm(Layer):
    """BatchNorm over all axes but the last (works for NHWC 4-D and NC 2-D).

    torch semantics (``nn.BatchNorm2d``/``1d``): train mode normalizes with
    biased batch statistics and updates running stats with
    ``running = (1-momentum)*running + momentum*stat`` where the running var
    uses the *unbiased* batch variance; eval mode uses running stats.
    """

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True
    sync_axes: Optional[Tuple[str, ...]] = None  # psum stats over mesh axes

    def init(self, key):
        p = {}
        if self.affine:
            p = {"weight": jnp.ones((self.num_features,)),
                 "bias": jnp.zeros((self.num_features,))}
        s = {"mean": jnp.zeros((self.num_features,)),
             "var": jnp.ones((self.num_features,))}
        return p, s

    def apply(self, params, state, x, ctx):
        if ctx.train and (ctx.bn_groups or 0) > 1:
            return self._apply_ghost(params, state, x, ctx.bn_groups)
        reduce_axes = tuple(range(x.ndim - 1))
        if ctx.train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            if self.sync_axes:
                # sync-BN over the data-parallel mesh axes: global mean
                # first, then pooled variance around it (equal per-device
                # batch shares under SPMD sharding)
                mean = lax.pmean(mean, self.sync_axes)
            # two-pass variance: the one-pass E[x^2]-E[x]^2 form
            # catastrophically cancels in f32 for channels with
            # |mean| >> std (var off by orders of magnitude, or negative
            # past eps -> NaN via rsqrt); torch computes two-pass
            var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)
            if self.sync_axes:
                var = lax.pmean(var, self.sync_axes)
            var = jnp.maximum(var, 0.0)
            n = 1
            for a in reduce_axes:
                n *= x.shape[a]
            if self.sync_axes:
                n = n * lax.psum(1, self.sync_axes)  # devices in the mesh axes
                correction = n / jnp.maximum(n - 1, 1)
            else:
                correction = n / max(n - 1, 1)
            unbiased = var * correction
            new_state = {
                "mean": (1 - self.momentum) * state["mean"]
                        + self.momentum * mean,
                "var": (1 - self.momentum) * state["var"]
                       + self.momentum * unbiased,
            }
        else:
            mean = state["mean"]
            var = state["var"]
            new_state = dict(state)  # unchanged, but structure is preserved
        inv = lax.rsqrt(var + self.eps)
        scale = inv
        shift = -mean * inv
        if self.affine:
            scale = scale * params["weight"]
            shift = shift * params["weight"] + params["bias"]
        y = x * scale.astype(x.dtype) + shift.astype(x.dtype)
        return y, new_state

    def _apply_ghost(self, params, state, x, groups: int):
        """Ghost/per-replica batch norm: split the global batch into
        ``groups`` contiguous shards and normalize each with its OWN
        statistics — the SPMD emulation of the reference's DataParallel
        BN, where each GPU normalizes its per-replica sub-batch
        (``train.py:219-222``). With groups == the mesh 'data' axis size
        and the batch sharded over it, the reshape aligns group-local
        reductions with device-local data, so XLA inserts no collectives.

        Running stats follow torch DataParallel faithfully: only replica
        0's in-place buffer updates survive the scatter/gather (the
        device-0 replica IS the master module), so group 0's statistics
        feed the running EMA."""
        b = x.shape[0]
        assert b % groups == 0, (b, groups)
        xf = x.astype(jnp.float32)
        xg = xf.reshape((groups, b // groups) + x.shape[1:])
        axes = tuple(range(1, xg.ndim - 1))
        mean = jnp.mean(xg, axis=axes)                       # (G, C)
        var = jnp.mean(
            jnp.square(xg - mean.reshape((groups,) + (1,) * len(axes)
                                         + (-1,))), axis=axes)
        var = jnp.maximum(var, 0.0)
        n = (b // groups)
        for a in axes[1:]:
            n *= xg.shape[a]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - self.momentum) * state["mean"]
                    + self.momentum * mean[0],
            "var": (1 - self.momentum) * state["var"]
                   + self.momentum * unbiased[0],
        }
        inv = lax.rsqrt(var + self.eps)
        scale = inv
        shift = -mean * inv
        if self.affine:
            scale = scale * params["weight"]
            shift = shift * params["weight"] + params["bias"]
        bshape = (groups,) + (1,) * len(axes) + (-1,)
        y = xg * scale.reshape(bshape) + shift.reshape(bshape)
        return y.reshape(x.shape).astype(x.dtype), new_state


BatchNorm2d = BatchNorm
BatchNorm1d = BatchNorm


@dataclasses.dataclass(frozen=True)
class InstanceNorm2d(Layer):
    """torch ``nn.InstanceNorm2d`` default: no affine, biased variance,
    per-sample per-channel over spatial dims. Used by the StyleGAN1 AdaIN
    path (``/root/reference/backbone/stylegan2_ada/generator.py:292-305``)."""

    num_features: int
    eps: float = 1e-5

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * lax.rsqrt(var + self.eps), {}


# ---------------------------------------------------------------------------
# Activations / regularization
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PReLU(Layer):
    """Per-channel PReLU (channel = last axis), init 0.25 as torch."""

    num_channels: int

    def init(self, key):
        return {"weight": jnp.full((self.num_channels,), 0.25)}, {}

    def apply(self, params, state, x, ctx):
        a = params["weight"].astype(x.dtype)
        return jnp.where(x >= 0, x, a * x), {}


@dataclasses.dataclass(frozen=True)
class ReLU(Layer):
    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        return jnp.maximum(x, 0), {}


@dataclasses.dataclass(frozen=True)
class LeakyReLU(Layer):
    negative_slope: float = 0.01

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        return jnp.where(x >= 0, x, self.negative_slope * x), {}


@dataclasses.dataclass(frozen=True)
class Sigmoid(Layer):
    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        return jax.nn.sigmoid(x), {}


@dataclasses.dataclass(frozen=True)
class Dropout(Layer):
    """Inverted dropout, active only in train mode (torch semantics)."""

    rate: float = 0.5

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        if not ctx.train or self.rate == 0.0:
            return x, {}
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(ctx.make_rng(), keep, x.shape)
        return jnp.where(mask, x / keep, 0).astype(x.dtype), {}


# ---------------------------------------------------------------------------
# Pooling / shape
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Subsample(Layer):
    """torch ``MaxPool2d(kernel_size=1, stride)`` == strided subsampling;
    the IR-block shortcut (``/root/reference/backbone/model_irse.py:53``)."""

    stride: int

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        s = self.stride
        return x[:, ::s, ::s, :], {}


@dataclasses.dataclass(frozen=True)
class MaxPool2d(Layer):
    kernel_size: IntPair
    stride: Optional[IntPair] = None
    padding: IntPair = 0

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride if self.stride is not None
                       else self.kernel_size)
        ph, pw = _pair(self.padding)
        # -inf init lets JAX recognize this as reduce_window_max (autodiff)
        neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
               else jnp.iinfo(x.dtype).min)
        y = lax.reduce_window(x, neg, lax.max, (1, kh, kw, 1), (1, sh, sw, 1),
                              [(0, 0), (ph, ph), (pw, pw), (0, 0)])
        return y, {}


@dataclasses.dataclass(frozen=True)
class AvgPool2d(Layer):
    """torch ``nn.AvgPool2d`` incl. padding semantics:
    ``count_include_pad=True`` (torch default) divides by the full window
    size everywhere; ``False`` divides by the number of REAL elements
    under each window (the pytorch-fid Inception variant's pools)."""

    kernel_size: IntPair
    stride: Optional[IntPair] = None
    padding: IntPair = 0
    count_include_pad: bool = True

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride if self.stride is not None
                       else self.kernel_size)
        ph, pw = _pair(self.padding)
        pads = [(0, 0), (ph, ph), (pw, pw), (0, 0)]
        y = lax.reduce_window(x, 0.0, lax.add, (1, kh, kw, 1),
                              (1, sh, sw, 1), pads)
        if self.count_include_pad or (ph == 0 and pw == 0):
            return y / (kh * kw), {}
        # per-position real-element count: same reduction over ones
        # (constant-folded by XLA; no runtime cost after fusion)
        ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
        counts = lax.reduce_window(ones, 0.0, lax.add, (1, kh, kw, 1),
                                   (1, sh, sw, 1), pads)
        return y / counts, {}


@dataclasses.dataclass(frozen=True)
class GlobalAvgPool(Layer):
    """AdaptiveAvgPool2d(1), keeps singleton spatial dims."""

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        return jnp.mean(x, axis=(1, 2), keepdims=True), {}


@dataclasses.dataclass(frozen=True)
class AdaptiveAvgPool2d(Layer):
    """torch ``AdaptiveAvgPool2d(out)``: for each output cell averages input
    range [floor(i*I/O), ceil((i+1)*I/O)). Used by pSp face_pool
    (``/root/reference/restyle-encoder/models/psp.py:33``)."""

    output_size: IntPair

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        oh, ow = _pair(self.output_size)
        ih, iw = x.shape[1], x.shape[2]
        if ih % oh == 0 and iw % ow == 0:
            kh, kw = ih // oh, iw // ow
            y = lax.reduce_window(x, 0.0, lax.add, (1, kh, kw, 1),
                                  (1, kh, kw, 1), "VALID") / (kh * kw)
            return y, {}
        # general case via per-axis averaging matrices (exact torch semantics)
        def pool_mat(i_size, o_size, dtype):
            import numpy as np
            m = np.zeros((i_size, o_size), dtype=np.float32)
            for o in range(o_size):
                s = (o * i_size) // o_size
                e = -(-((o + 1) * i_size) // o_size)
                m[s:e, o] = 1.0 / (e - s)
            return jnp.asarray(m, dtype)
        mh = pool_mat(ih, oh, x.dtype)
        mw = pool_mat(iw, ow, x.dtype)
        y = jnp.einsum("nhwc,hH->nHwc", x, mh)
        y = jnp.einsum("nHwc,wW->nHWc", y, mw)
        return y, {}


@dataclasses.dataclass(frozen=True)
class Flatten(Layer):
    """Flatten trailing dims. NOTE layout: flattening NHWC yields (H,W,C)
    ordering vs torch's (C,H,W); the torch-checkpoint converter permutes the
    following Linear accordingly (see utils/torch_convert.py)."""

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        return x.reshape(x.shape[0], -1), {}
