"""EfficientNet-B0..B7 face-recognition backbone.

Parity target: ``/root/reference/backbone/EfficientNets.py`` (lukemelas
lineage adapted for face recognition): TF-style same-padding convs, swish,
MBConv blocks (expand -> depthwise -> SE -> project, id-skip with drop
connect), stride-1 stem for 112x112 faces, 1280-ch conv head, then
BN2d -> Dropout -> Flatten -> Linear(1280*h*w -> feat) -> BN1d
(``EfficientNets.py:826-833``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..nn import (BatchNorm1d, BatchNorm2d, Conv2d, Dropout, Flatten, Layer,
                  Linear, Sequential, init_child)


def swish(x):
    return x * jax.nn.sigmoid(x)


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


@dataclasses.dataclass(frozen=True)
class BlockArgs:
    num_repeat: int
    kernel_size: int
    stride: int
    expand_ratio: int
    input_filters: int
    output_filters: int
    se_ratio: float = 0.25
    id_skip: bool = True


# the canonical B0 block table (BlockDecoder strings, EfficientNets.py:352)
B0_BLOCKS = (
    BlockArgs(1, 3, 1, 1, 32, 16),
    BlockArgs(2, 3, 2, 6, 16, 24),
    BlockArgs(2, 5, 2, 6, 24, 40),
    BlockArgs(3, 3, 2, 6, 40, 80),
    BlockArgs(3, 5, 1, 6, 80, 112),
    BlockArgs(4, 5, 2, 6, 112, 192),
    BlockArgs(1, 3, 1, 6, 192, 320),
)

# (width, depth, dropout) per variant (efficientnet_params, :450-473)
VARIANTS = {
    "b0": (1.0, 1.0, 0.2), "b1": (1.0, 1.1, 0.2), "b2": (1.1, 1.2, 0.3),
    "b3": (1.2, 1.4, 0.3), "b4": (1.4, 1.8, 0.4), "b5": (1.6, 2.2, 0.4),
    "b6": (1.8, 2.6, 0.5), "b7": (2.0, 3.1, 0.5),
}


def _same_pad(i: int, k: int, s: int) -> Tuple[int, int]:
    """TF 'SAME' padding (static shapes known at trace time)."""
    pad = max((-(-i // s) - 1) * s + k - i, 0)
    return pad // 2, pad - pad // 2


@dataclasses.dataclass(frozen=True)
class SamePadConv(Layer):
    """``Conv2dStaticSamePadding`` (:207-260); asymmetric explicit pads."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    bias: bool = False

    def init(self, key):
        return Conv2d(self.in_channels, self.out_channels,
                      self.kernel_size, groups=self.groups,
                      use_bias=self.bias,
                      init_mode="torch_default").init(key)

    def apply(self, params, state, x, ctx):
        ph = _same_pad(x.shape[1], self.kernel_size, self.stride)
        pw = _same_pad(x.shape[2], self.kernel_size, self.stride)
        y = lax.conv_general_dilated(
            x, params["weight"].astype(x.dtype),
            (self.stride, self.stride), [ph, pw],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
            preferred_element_type=x.dtype)
        if self.bias:
            y = y + params["bias"].astype(x.dtype)
        return y, {}


@dataclasses.dataclass(frozen=True)
class MBConvBlock(Layer):
    """``EfficientNets.py:641-745``."""

    args: BlockArgs
    bn_mom: float = 0.01   # torch momentum = 1 - tf 0.99
    bn_eps: float = 1e-3

    def _children(self):
        a = self.args
        inp = a.input_filters
        oup = inp * a.expand_ratio
        d = {}
        if a.expand_ratio != 1:
            d["_expand_conv"] = SamePadConv(inp, oup, 1)
            d["_bn0"] = BatchNorm2d(oup, eps=self.bn_eps,
                                    momentum=self.bn_mom)
        d["_depthwise_conv"] = SamePadConv(oup, oup, a.kernel_size,
                                           a.stride, groups=oup)
        d["_bn1"] = BatchNorm2d(oup, eps=self.bn_eps, momentum=self.bn_mom)
        if a.se_ratio and 0 < a.se_ratio <= 1:
            sq = max(1, int(inp * a.se_ratio))
            d["_se_reduce"] = SamePadConv(oup, sq, 1, bias=True)
            d["_se_expand"] = SamePadConv(sq, oup, 1, bias=True)
        d["_project_conv"] = SamePadConv(oup, a.output_filters, 1)
        d["_bn2"] = BatchNorm2d(a.output_filters, eps=self.bn_eps,
                                momentum=self.bn_mom)
        return d

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx, drop_connect_rate=None):
        a = self.args
        ch = self._children()
        new_state = {}

        def run(name, h):
            s = state.get(name, {})
            h, ns = ch[name].apply(params[name], s, h, ctx)
            if s or ns:
                new_state[name] = ns
            return h

        inputs = x
        if a.expand_ratio != 1:
            x = swish(run("_bn0", run("_expand_conv", x)))
        x = swish(run("_bn1", run("_depthwise_conv", x)))
        if "_se_reduce" in ch:
            s = jnp.mean(x, axis=(1, 2), keepdims=True)
            s = run("_se_expand", swish(run("_se_reduce", s)))
            x = jax.nn.sigmoid(s) * x
        x = run("_bn2", run("_project_conv", x))
        if (a.id_skip and a.stride == 1
                and a.input_filters == a.output_filters):
            if drop_connect_rate and ctx.train:
                keep = 1.0 - drop_connect_rate
                mask = jax.random.bernoulli(ctx.make_rng(), keep,
                                            (x.shape[0], 1, 1, 1))
                x = jnp.where(mask, x / keep, 0.0)
            x = x + inputs
        return x, new_state


@dataclasses.dataclass(frozen=True)
class EfficientNet(Layer):
    """``EfficientNets.py:748-879`` (stride-1 stem variant, :789)."""

    variant: str = "b0"
    feat_dim: int = 512
    out_h: int = 7
    out_w: int = 7
    drop_connect_rate: float = 0.2

    def _scaled_blocks(self):
        width, depth, _ = VARIANTS[self.variant]
        blocks = []
        for ba in B0_BLOCKS:
            ba = dataclasses.replace(
                ba,
                input_filters=round_filters(ba.input_filters, width),
                output_filters=round_filters(ba.output_filters, width),
                num_repeat=round_repeats(ba.num_repeat, depth))
            blocks.append(ba)
            if ba.num_repeat > 1:
                ba = dataclasses.replace(ba,
                                         input_filters=ba.output_filters,
                                         stride=1)
            for _ in range(blocks[-1].num_repeat - 1):
                blocks.append(dataclasses.replace(ba, num_repeat=1))
        return blocks

    def _children(self):
        width, depth, dropout = VARIANTS[self.variant]
        stem_ch = round_filters(32, width)
        d = {"_conv_stem": SamePadConv(3, stem_ch, 3, stride=1),
             "_bn0": BatchNorm2d(stem_ch, eps=1e-3, momentum=0.01)}
        blocks = self._scaled_blocks()
        for i, ba in enumerate(blocks):
            d[f"_blocks.{i}"] = MBConvBlock(ba)
        head_in = blocks[-1].output_filters
        head_out = round_filters(1280, width)
        d["_conv_head"] = SamePadConv(head_in, head_out, 1)
        d["_bn1"] = BatchNorm2d(head_out, eps=1e-3, momentum=0.01)
        d["output_layer"] = Sequential(
            BatchNorm2d(head_out), Dropout(dropout), Flatten(),
            Linear(head_out * self.out_h * self.out_w, self.feat_dim),
            BatchNorm1d(self.feat_dim))
        return d

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        new_state = {}

        def run(name, h, **kw):
            s = state.get(name, {})
            h, ns = ch[name].apply(params[name], s, h, ctx, **kw)
            if s or ns:
                new_state[name] = ns
            return h

        x = swish(run("_bn0", run("_conv_stem", x)))
        n_blocks = sum(1 for k in ch if k.startswith("_blocks."))
        for i in range(n_blocks):
            rate = self.drop_connect_rate * i / n_blocks \
                if self.drop_connect_rate else None
            x = run(f"_blocks.{i}", x, drop_connect_rate=rate)
        x = swish(run("_bn1", run("_conv_head", x)))
        x = run("output_layer", x)
        return x, new_state


def EfficientNetB0(feat_dim=512, out_h=7, out_w=7):
    return EfficientNet("b0", feat_dim, out_h, out_w)
