"""IR / IR-SE ResNet face-recognition backbones (the stack's workhorse).

Architecture parity with ``/root/reference/backbone/model_irse.py`` (blocks
``bottleneck_IR``/``bottleneck_IR_SE`` at :49-91, layouts ``get_blocks``
:103-126, ``Backbone`` :129-172) and the dropout-insertable variant in
``/root/reference/backbone/restyle_psp_helpers.py:119-216``.

Param-tree paths deliberately mirror the torch module names
(``input_layer.0.weight``, ``body.3.res_layer.1.weight``, ...) so the
torch-checkpoint converter is a mechanical key walk.

Layout: NHWC; 112x112 (or 224) RGB in [-1, 1] -> 512-d embedding.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn import (BatchNorm1d, BatchNorm2d, Conv2d, Ctx, Dropout, Flatten,
                  GlobalAvgPool, Layer, Linear, PReLU, ReLU, Sequential,
                  Sigmoid, Subsample, init_child)


@dataclasses.dataclass(frozen=True)
class SEModule(Layer):
    """Squeeze-excitation (``model_irse.py:23-46``): global-avg-pool ->
    1x1 conv C/r -> ReLU -> 1x1 conv C -> sigmoid -> channel gate."""

    channels: int
    reduction: int = 16

    def _children(self):
        return {
            "fc1": Conv2d(self.channels, self.channels // self.reduction, 1,
                          use_bias=False),
            "fc2": Conv2d(self.channels // self.reduction, self.channels, 1,
                          use_bias=False),
        }

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s, _ = ch["fc1"].apply(params["fc1"], {}, s, ctx)
        s = jnp.maximum(s, 0)
        s, _ = ch["fc2"].apply(params["fc2"], {}, s, ctx)
        s = jax.nn.sigmoid(s)
        return x * s, {}


@dataclasses.dataclass(frozen=True)
class BottleneckIR(Layer):
    """``bottleneck_IR`` (``model_irse.py:49-66``): shortcut (subsample or
    1x1 conv+BN) + residual BN->conv3x3->PReLU->conv3x3(stride)->BN.

    ``dropout`` inserts Dropout after each conv (and in the conv shortcut)
    exactly as ``restyle_psp_helpers.bottleneck_IR_SE.add_dropout``
    (``restyle_psp_helpers.py:201-212``) — rate is a static hyper-param,
    so checkpoints transfer between dropout-on/off variants unchanged.
    """

    in_channel: int
    depth: int
    stride: int
    se: bool = False
    dropout: Optional[float] = None

    def _children(self):
        d = {}
        if self.in_channel == self.depth:
            d["shortcut_layer"] = Subsample(self.stride)
        else:
            d["shortcut_layer"] = Sequential(
                Conv2d(self.in_channel, self.depth, 1, stride=self.stride,
                       use_bias=False),
                BatchNorm2d(self.depth))
        res = [BatchNorm2d(self.in_channel),
               Conv2d(self.in_channel, self.depth, 3, padding=1,
                      use_bias=False),
               PReLU(self.depth),
               Conv2d(self.depth, self.depth, 3, stride=self.stride,
                      padding=1, use_bias=False),
               BatchNorm2d(self.depth)]
        if self.se:
            res.append(SEModule(self.depth, 16))
        d["res_layer"] = Sequential(*res)
        return d

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        new_state = {}
        sc_p = params.get("shortcut_layer", {})
        sc_s = state.get("shortcut_layer", {})
        shortcut, ns = ch["shortcut_layer"].apply(sc_p, sc_s, x, ctx)
        if sc_s or ns:
            new_state["shortcut_layer"] = ns
        if self.dropout and self.in_channel != self.depth:
            shortcut, _ = Dropout(self.dropout).apply({}, {}, shortcut, ctx)

        # res path, with optional dropout after conv1 / conv2
        res_layers = ch["res_layer"].layers
        rp = params["res_layer"]
        rs = state.get("res_layer", {})
        nrs = {}
        h = x
        for i, lyr in enumerate(res_layers):
            s_i = rs.get(str(i), {})
            h, ns = lyr.apply(rp.get(str(i), {}), s_i, h, ctx)
            if s_i or ns:
                nrs[str(i)] = ns
            if self.dropout and i in (1, 3):  # after each 3x3 conv
                h, _ = Dropout(self.dropout).apply({}, {}, h, ctx)
        new_state["res_layer"] = nrs
        return h + shortcut, new_state


def get_blocks(num_layers: int) -> Tuple[Tuple[int, int, int], ...]:
    """(in_channel, depth, stride) per unit; layouts of
    ``model_irse.py:103-126`` plus the 34-layer variant of
    ``restyle_psp_helpers.py:33-64``."""
    def stage(in_ch, depth, units, stride=2):
        return [(in_ch, depth, stride)] + [(depth, depth, 1)] * (units - 1)

    layouts = {
        34: [(64, 64, 3), (64, 128, 4), (128, 256, 6), (256, 512, 3)],
        50: [(64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3)],
        100: [(64, 64, 3), (64, 128, 13), (128, 256, 30), (256, 512, 3)],
        152: [(64, 64, 3), (64, 128, 8), (128, 256, 36), (256, 512, 3)],
    }
    if num_layers not in layouts:
        raise ValueError(f"num_layers must be one of {sorted(layouts)}")
    units = []
    for in_ch, depth, n in layouts[num_layers]:
        units.extend(stage(in_ch, depth, n))
    return tuple(units)


@dataclasses.dataclass(frozen=True)
class Backbone(Layer):
    """IR / IR-SE backbone (``model_irse.py:129-172``).

    input_layer: conv3x3 -> BN -> PReLU;
    body: stacked bottleneck units;
    output_layer: BN2d -> Dropout -> Flatten -> Linear(512*s*s -> emb) -> BN1d.

    ``in_channels=6`` supports the pSp avg-image-concat input
    (``restyle_psp.py:137``); ``input_size`` 112/224 picks the 7x7/14x14
    flatten as in the reference.
    """

    input_size: int = 112
    num_layers: int = 50
    mode: str = "ir"          # 'ir' | 'ir_se'
    in_channels: int = 3
    emb_size: int = 512
    drop_ratio: float = 0.5   # torch nn.Dropout() default in output_layer
    block_dropout: Optional[float] = None

    def __post_init__(self):
        assert self.mode in ("ir", "ir_se")

    @property
    def _end_spatial(self) -> int:
        # four stride-2 stages (each ceil(n/2) for k=3,p=1,s=2):
        # 112 -> 7, 224 -> 14, 256 -> 16, 200 -> 13 (restyle_psp.py:158-165)
        sp = self.input_size
        for _ in range(4):
            sp = -(-sp // 2)
        return sp

    def _children(self):
        se = self.mode == "ir_se"
        body = [BottleneckIR(ic, d, s, se=se, dropout=self.block_dropout)
                for ic, d, s in get_blocks(self.num_layers)]
        sp = self._end_spatial
        return {
            "input_layer": Sequential(
                Conv2d(self.in_channels, 64, 3, padding=1, use_bias=False),
                BatchNorm2d(64), PReLU(64)),
            "body": Sequential(*body),
            "output_layer": Sequential(
                BatchNorm2d(512), Dropout(self.drop_ratio), Flatten(),
                Linear(512 * sp * sp, self.emb_size),
                BatchNorm1d(self.emb_size)),
        }

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        new_state = {}
        for name in ("input_layer", "body", "output_layer"):
            x, ns = ch[name].apply(params[name], state.get(name, {}), x, ctx)
            new_state[name] = ns
        return x, new_state

    def features(self, params, state, x, ctx):
        """Run input_layer + body only (the 512 x s x s feature map) —
        the tap used by pSp style heads."""
        ch = self._children()
        new_state = {}
        for name in ("input_layer", "body"):
            x, ns = ch[name].apply(params[name], state.get(name, {}), x, ctx)
            new_state[name] = ns
        return x, new_state


def IR_50(input_size=112, **kw):
    return Backbone(input_size, 50, "ir", **kw)


def IR_101(input_size=112, **kw):
    return Backbone(input_size, 100, "ir", **kw)


def IR_152(input_size=112, **kw):
    return Backbone(input_size, 152, "ir", **kw)


def IR_SE_50(input_size=112, **kw):
    return Backbone(input_size, 50, "ir_se", **kw)


def IR_SE_101(input_size=112, **kw):
    return Backbone(input_size, 100, "ir_se", **kw)


def IR_SE_152(input_size=112, **kw):
    return Backbone(input_size, 152, "ir_se", **kw)


def l2_norm(x: jax.Array, axis: int = 1, eps: float = 0.0) -> jax.Array:
    """``model_irse.py:16-20``."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / (norm + eps)
