"""GhostNet face-recognition backbone.

Parity target: ``/root/reference/backbone/GhostNet.py`` (Huawei ghostnet
lineage): GhostModules (primary conv + cheap depthwise 'ghost' features,
concatenated), ghost bottlenecks with optional hard-sigmoid SE, stride-1
stem, BN/Dropout/Flatten/Linear(960*7*7 -> 512)/BN1d output head.
"""

from __future__ import annotations

import dataclasses
import math
import jax
import jax.numpy as jnp

from ..nn import (BatchNorm1d, BatchNorm2d, Conv2d, Dropout, Flatten, Layer,
                  Linear, Sequential, init_child)


def _make_divisible(v, divisor=4, min_value=None):
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hard_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


@dataclasses.dataclass(frozen=True)
class SqueezeExcite(Layer):
    """``GhostNet.py:49-66`` — ReLU reduce, hard-sigmoid gate."""

    in_chs: int
    se_ratio: float = 0.25

    def _children(self):
        red = _make_divisible(self.in_chs * self.se_ratio, 4)
        return {"conv_reduce": Conv2d(self.in_chs, red, 1,
                                      init_mode="torch_default"),
                "conv_expand": Conv2d(red, self.in_chs, 1,
                                      init_mode="torch_default")}

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s, _ = ch["conv_reduce"].apply(params["conv_reduce"], {}, s, ctx)
        s = jnp.maximum(s, 0)
        s, _ = ch["conv_expand"].apply(params["conv_expand"], {}, s, ctx)
        return x * hard_sigmoid(s), {}


@dataclasses.dataclass(frozen=True)
class GhostModule(Layer):
    """``GhostNet.py:84-107``: primary conv to ceil(out/ratio) channels +
    cheap depthwise to (ratio-1)x that, concat, trim to oup."""

    inp: int
    oup: int
    kernel_size: int = 1
    ratio: int = 2
    dw_size: int = 3
    stride: int = 1
    relu: bool = True

    def _children(self):
        init_ch = math.ceil(self.oup / self.ratio)
        new_ch = init_ch * (self.ratio - 1)
        return {
            "primary_conv": Sequential(
                Conv2d(self.inp, init_ch, self.kernel_size,
                       stride=self.stride, padding=self.kernel_size // 2,
                       use_bias=False, init_mode="torch_default"),
                BatchNorm2d(init_ch)),
            "cheap_operation": Sequential(
                Conv2d(init_ch, new_ch, self.dw_size, padding=
                       self.dw_size // 2, groups=init_ch, use_bias=False,
                       init_mode="torch_default"),
                BatchNorm2d(new_ch)),
        }

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        new_state = {}
        x1, ns = ch["primary_conv"].apply(params["primary_conv"],
                                          state.get("primary_conv", {}),
                                          x, ctx)
        new_state["primary_conv"] = ns
        if self.relu:
            x1 = jnp.maximum(x1, 0)
        x2, ns = ch["cheap_operation"].apply(
            params["cheap_operation"], state.get("cheap_operation", {}),
            x1, ctx)
        new_state["cheap_operation"] = ns
        if self.relu:
            x2 = jnp.maximum(x2, 0)
        out = jnp.concatenate([x1, x2], axis=-1)
        return out[..., : self.oup], new_state


@dataclasses.dataclass(frozen=True)
class GhostBottleneck(Layer):
    """``GhostNet.py:110-170``."""

    in_chs: int
    mid_chs: int
    out_chs: int
    dw_kernel_size: int = 3
    stride: int = 1
    se_ratio: float = 0.0

    def _children(self):
        d = {"ghost1": GhostModule(self.in_chs, self.mid_chs, relu=True),
             "ghost2": GhostModule(self.mid_chs, self.out_chs, relu=False)}
        if self.stride > 1:
            d["conv_dw"] = Conv2d(self.mid_chs, self.mid_chs,
                                  self.dw_kernel_size, stride=self.stride,
                                  padding=(self.dw_kernel_size - 1) // 2,
                                  groups=self.mid_chs, use_bias=False,
                                  init_mode="torch_default")
            d["bn_dw"] = BatchNorm2d(self.mid_chs)
        if self.se_ratio and self.se_ratio > 0:
            d["se"] = SqueezeExcite(self.mid_chs, self.se_ratio)
        if not (self.in_chs == self.out_chs and self.stride == 1):
            d["shortcut"] = Sequential(
                Conv2d(self.in_chs, self.in_chs, self.dw_kernel_size,
                       stride=self.stride,
                       padding=(self.dw_kernel_size - 1) // 2,
                       groups=self.in_chs, use_bias=False,
                       init_mode="torch_default"),
                BatchNorm2d(self.in_chs),
                Conv2d(self.in_chs, self.out_chs, 1, use_bias=False,
                       init_mode="torch_default"),
                BatchNorm2d(self.out_chs))
        return d

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        new_state = {}

        def run(name, h):
            s = state.get(name, {})
            h, ns = ch[name].apply(params.get(name, {}), s, h, ctx)
            if s or ns:
                new_state[name] = ns
            return h

        residual = x
        x = run("ghost1", x)
        if self.stride > 1:
            x = run("conv_dw", x)
            x = run("bn_dw", x)
        if "se" in ch:
            x = run("se", x)
        x = run("ghost2", x)
        if "shortcut" in ch:
            residual = run("shortcut", residual)
        return x + residual, new_state


GHOSTNET_CFGS = (
    ((3, 16, 16, 0.0, 1),),
    ((3, 48, 24, 0.0, 2),),
    ((3, 72, 24, 0.0, 1),),
    ((5, 72, 40, 0.25, 2),),
    ((5, 120, 40, 0.25, 1),),
    ((3, 240, 80, 0.0, 2),),
    ((3, 200, 80, 0.0, 1), (3, 184, 80, 0.0, 1), (3, 184, 80, 0.0, 1),
     (3, 480, 112, 0.25, 1), (3, 672, 112, 0.25, 1)),
    ((5, 672, 160, 0.25, 2),),
    ((5, 960, 160, 0.0, 1), (5, 960, 160, 0.25, 1), (5, 960, 160, 0.0, 1),
     (5, 960, 160, 0.25, 1)),
)


@dataclasses.dataclass(frozen=True)
class GhostNet(Layer):
    """``GhostNet.py:173-243`` — stride-1 stem (112 input -> 7x7 final)."""

    width: float = 1.0
    drop_ratio: float = 0.2
    feat_dim: int = 512
    out_h: int = 7
    out_w: int = 7

    def _children(self):
        w = self.width
        out_ch = _make_divisible(16 * w, 4)
        d = {"conv_stem": Conv2d(3, out_ch, 3, stride=1, padding=1,
                                 use_bias=False,
                                 init_mode="torch_default"),
             "bn1": BatchNorm2d(out_ch)}
        in_ch = out_ch
        si = 0
        exp = 16
        for cfg in GHOSTNET_CFGS:
            blocks = []
            for k, exp, c, se, s in cfg:
                out_c = _make_divisible(c * w, 4)
                mid_c = _make_divisible(exp * w, 4)
                blocks.append(GhostBottleneck(in_ch, mid_c, out_c, k, s,
                                              se_ratio=se))
                in_ch = out_c
            d[f"blocks.{si}"] = Sequential(*blocks)
            si += 1
        out_c = _make_divisible(exp * w, 4)
        # final ConvBnAct stage (blocks.<last>.0.{conv,bn1})
        d[f"blocks.{si}"] = _FinalConvBnAct(in_ch, out_c)
        d["output_layer"] = Sequential(
            BatchNorm2d(out_c), Dropout(self.drop_ratio), Flatten(),
            Linear(out_c * self.out_h * self.out_w, self.feat_dim),
            BatchNorm1d(self.feat_dim))
        return d

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        new_state = {}

        def run(name, h):
            s = state.get(name, {})
            h, ns = ch[name].apply(params[name], s, h, ctx)
            if s or ns:
                new_state[name] = ns
            return h

        x = jnp.maximum(run("bn1", run("conv_stem", x)), 0)
        n_stages = len(GHOSTNET_CFGS) + 1
        for i in range(n_stages):
            x = run(f"blocks.{i}", x)
        # output head stays NHWC; the converter permutes the Linear via
        # flatten_info {"output_layer.3": (out_h, out_w, 960)}
        x = run("output_layer", x)
        return x, new_state


class _FinalConvBnAct(Layer):
    """blocks.<last> = Sequential(ConvBnAct(...)): child '0.conv'/'0.bn1'."""

    def __init__(self, in_ch, out_ch):
        self.in_ch = in_ch
        self.out_ch = out_ch

    def _children(self):
        return {"0.conv": Conv2d(self.in_ch, self.out_ch, 1, use_bias=False,
                                 init_mode="torch_default"),
                "0.bn1": BatchNorm2d(self.out_ch)}

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        new_state = {}
        x, _ = ch["0.conv"].apply(params["0.conv"], {}, x, ctx)
        x, ns = ch["0.bn1"].apply(params["0.bn1"], state.get("0.bn1", {}),
                                  x, ctx)
        new_state["0.bn1"] = ns
        return jnp.maximum(x, 0), new_state
