"""MobileFaceNet — lightweight face-recognition backbone.

Parity target: ``/root/reference/backbone/MobileFaceNets.py`` (InsightFace
lineage): depthwise-separable bottlenecks with PReLU, global depthwise
conv of kernel (out_h, out_w), Linear(512 -> emb, no bias) + BN1d.
NHWC; depthwise convs map to ``feature_group_count`` on the VPU/MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from ..nn import (BatchNorm1d, BatchNorm2d, Conv2d, Flatten, Layer, Linear,
                  PReLU, Sequential, init_child)


@dataclasses.dataclass(frozen=True)
class _NamedChain(Layer):
    """Container whose children carry torch attribute names (so converter
    paths line up, e.g. 'conv1.conv.weight')."""

    children_spec: Tuple[Tuple[str, Layer], ...]

    def _children(self):
        return dict(self.children_spec)

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        new_state = {}
        for name, lyr in self.children_spec:
            s = state.get(name, {})
            x, ns = lyr.apply(params.get(name, {}), s, x, ctx)
            if s or ns:
                new_state[name] = ns
        return x, new_state


def ConvBlock(in_c, out_c, kernel=1, stride=1, padding=0, groups=1):
    """``Conv_block`` (:11-21): conv -> BN -> PReLU."""
    return _NamedChain((
        ("conv", Conv2d(in_c, out_c, kernel, stride=stride, padding=padding,
                        use_bias=False, groups=groups,
                        init_mode="torch_default")),
        ("bn", BatchNorm2d(out_c)),
        ("prelu", PReLU(out_c))))


def LinearBlock(in_c, out_c, kernel=1, stride=1, padding=0, groups=1):
    """``Linear_block`` (:23-31): conv -> BN."""
    return _NamedChain((
        ("conv", Conv2d(in_c, out_c, kernel, stride=stride, padding=padding,
                        use_bias=False, groups=groups,
                        init_mode="torch_default")),
        ("bn", BatchNorm2d(out_c))))


@dataclasses.dataclass(frozen=True)
class DepthWise(Layer):
    """``Depth_Wise`` (:33-50): 1x1 expand -> depthwise kxk -> 1x1 project,
    optional residual. NOTE the reference's 'groups' arg is the EXPANSION
    width."""

    in_c: int
    out_c: int
    residual: bool = False
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    groups: int = 1

    def _children(self):
        g = self.groups
        return {
            "conv": ConvBlock(self.in_c, g, 1),
            "conv_dw": ConvBlock(g, g, self.kernel, self.stride,
                                 self.padding, groups=g),
            "project": LinearBlock(g, self.out_c, 1),
        }

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        new_state = {}
        h = x
        for name in ("conv", "conv_dw", "project"):
            h, ns = ch[name].apply(params[name], state.get(name, {}), h,
                                   ctx)
            new_state[name] = ns
        if self.residual:
            h = h + x
        return h, new_state


def ResidualStack(c, num_block, groups, kernel=3, stride=1, padding=1):
    """``Residual`` (:52-60): num_block residual DepthWise units. Children
    named 'model.<i>' to mirror the torch Sequential nesting."""
    return Sequential(*[
        DepthWise(c, c, residual=True, kernel=kernel, stride=stride,
                  padding=padding, groups=groups)
        for _ in range(num_block)])


@dataclasses.dataclass(frozen=True)
class MobileFaceNet(Layer):
    """``MobileFaceNet`` (:62-95). out_h/out_w: the final feature map size
    consumed by the global depthwise conv (7x7 for 112x112 input)."""

    embedding_size: int = 512
    out_h: int = 7
    out_w: int = 7

    def _children(self):
        return {
            "conv1": ConvBlock(3, 64, 3, 2, 1),
            "conv2_dw": ConvBlock(64, 64, 3, 1, 1, groups=64),
            "conv_23": DepthWise(64, 64, kernel=3, stride=2, padding=1,
                                 groups=128),
            "conv_3.model": ResidualStack(64, 4, 128),
            "conv_34": DepthWise(64, 128, kernel=3, stride=2, padding=1,
                                 groups=256),
            "conv_4.model": ResidualStack(128, 6, 256),
            "conv_45": DepthWise(128, 128, kernel=3, stride=2, padding=1,
                                 groups=512),
            "conv_5.model": ResidualStack(128, 2, 256),
            "conv_6_sep": ConvBlock(128, 512, 1),
            "conv_6_dw": LinearBlock(512, 512,
                                     kernel=(self.out_h, self.out_w),
                                     groups=512),
            "linear": Linear(512, self.embedding_size, use_bias=False),
            "bn": BatchNorm1d(self.embedding_size),
        }

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        new_state = {}
        order = ("conv1", "conv2_dw", "conv_23", "conv_3.model", "conv_34",
                 "conv_4.model", "conv_45", "conv_5.model", "conv_6_sep",
                 "conv_6_dw")
        for name in order:
            x, ns = ch[name].apply(params[name], state.get(name, {}), x,
                                   ctx)
            new_state[name] = ns
        x = x.reshape(x.shape[0], -1)
        x, _ = ch["linear"].apply(params["linear"], {}, x, ctx)
        x, ns = ch["bn"].apply(params["bn"], state.get("bn", {}), x, ctx)
        new_state["bn"] = ns
        return x, new_state
