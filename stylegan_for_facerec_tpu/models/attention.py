"""Residual Attention Network backbone.

Parity target: ``/root/reference/backbone/AttentionNets.py`` (tengshaofeng
lineage): pre-activation bottleneck ResidualBlocks, hourglass attention
masks with (1 + sigmoid(mask)) * trunk gating, align-corners bilinear
upsampling, Flatten -> Linear(2048*h*w -> feat, no bias) -> BN1d head.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from ..nn import (BatchNorm1d, BatchNorm2d, Conv2d, Layer, Linear,
                  MaxPool2d, Sequential, Sigmoid, init_child)
from ..ops.image import resize_bilinear_align_corners


@dataclasses.dataclass(frozen=True)
class ResidualBlock(Layer):
    """``AttentionNets.py:15-45`` (pre-activation bottleneck; note the
    shortcut conv4 consumes the PRE-activation relu(bn1(x)))."""

    input_channels: int
    output_channels: int
    stride: int = 1

    def _children(self):
        ci, co = self.input_channels, self.output_channels
        d = {"bn1": BatchNorm2d(ci),
             "conv1": Conv2d(ci, co // 4, 1, use_bias=False,
                             init_mode="torch_default"),
             "bn2": BatchNorm2d(co // 4),
             "conv2": Conv2d(co // 4, co // 4, 3, stride=self.stride,
                             padding=1, use_bias=False,
                             init_mode="torch_default"),
             "bn3": BatchNorm2d(co // 4),
             "conv3": Conv2d(co // 4, co, 1, use_bias=False,
                             init_mode="torch_default"),
             "conv4": Conv2d(ci, co, 1, stride=self.stride, use_bias=False,
                             init_mode="torch_default")}
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

        residual = x
        out1 = jnp.maximum(run("bn1", x), 0)
        out = run("conv1", out1)
        out = jnp.maximum(run("bn2", out), 0)
        out = run("conv2", out)
        out = jnp.maximum(run("bn3", out), 0)
        out = run("conv3", out)
        if (self.input_channels != self.output_channels
                or self.stride != 1):
            residual = run("conv4", out1)
        return out + residual, new_state


def _mask_head(channels):
    """softmax{4,6,2}_blocks tail: BN-ReLU-conv1x1 x2 -> sigmoid."""
    from ..nn import ReLU
    return Sequential(BatchNorm2d(channels), ReLU(),
                      Conv2d(channels, channels, 1, use_bias=False,
                             init_mode="torch_default"),
                      BatchNorm2d(channels), ReLU(),
                      Conv2d(channels, channels, 1, use_bias=False,
                             init_mode="torch_default"),
                      Sigmoid())


@dataclasses.dataclass(frozen=True)
class AttentionModule(Layer):
    """Stages 1-3 unified (``AttentionNets.py:47-193``): ``depth`` pooling
    levels in the hourglass mask branch (stage1=3, stage2=2, stage3=1)."""

    channels: int
    depth: int

    def _children(self):
        c = self.channels
        d = {"first_residual_blocks": ResidualBlock(c, c),
             "trunk_branches": Sequential(ResidualBlock(c, c),
                                          ResidualBlock(c, c)),
             "last_blocks": ResidualBlock(c, c)}
        if self.depth == 3:
            d.update({
                "softmax1_blocks": ResidualBlock(c, c),
                "skip1_connection_residual_block": ResidualBlock(c, c),
                "softmax2_blocks": ResidualBlock(c, c),
                "skip2_connection_residual_block": ResidualBlock(c, c),
                "softmax3_blocks": Sequential(ResidualBlock(c, c),
                                              ResidualBlock(c, c)),
                "softmax4_blocks": ResidualBlock(c, c),
                "softmax5_blocks": ResidualBlock(c, c),
                "softmax6_blocks": _mask_head(c)})
        elif self.depth == 2:
            d.update({
                "softmax1_blocks": ResidualBlock(c, c),
                "skip1_connection_residual_block": ResidualBlock(c, c),
                "softmax2_blocks": Sequential(ResidualBlock(c, c),
                                              ResidualBlock(c, c)),
                "softmax3_blocks": ResidualBlock(c, c),
                "softmax4_blocks": _mask_head(c)})
        else:
            d.update({
                "softmax1_blocks": Sequential(ResidualBlock(c, c),
                                              ResidualBlock(c, c)),
                "softmax2_blocks": _mask_head(c)})
        return d

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        new_state = {}
        pool = MaxPool2d(3, 2, padding=1)

        def run(name, h):
            s = state.get(name, {})
            h, ns = ch[name].apply(params[name], s, h, ctx)
            if s or ns:
                new_state[name] = ns
            return h

        def up_to(h, ref):
            return resize_bilinear_align_corners(h, ref.shape[1],
                                                 ref.shape[2])

        x = run("first_residual_blocks", x)
        trunk = run("trunk_branches", x)

        if self.depth == 3:
            p1, _ = pool.apply({}, {}, x, ctx)
            s1 = run("softmax1_blocks", p1)
            skip1 = run("skip1_connection_residual_block", s1)
            p2, _ = pool.apply({}, {}, s1, ctx)
            s2 = run("softmax2_blocks", p2)
            skip2 = run("skip2_connection_residual_block", s2)
            p3, _ = pool.apply({}, {}, s2, ctx)
            s3 = run("softmax3_blocks", p3)
            out = up_to(s3, s2) + s2 + skip2
            s4 = run("softmax4_blocks", out)
            out = up_to(s4, s1) + s1 + skip1
            s5 = run("softmax5_blocks", out)
            mask_in = up_to(s5, trunk) + trunk
            mask = run("softmax6_blocks", mask_in)
        elif self.depth == 2:
            p1, _ = pool.apply({}, {}, x, ctx)
            s1 = run("softmax1_blocks", p1)
            skip1 = run("skip1_connection_residual_block", s1)
            p2, _ = pool.apply({}, {}, s1, ctx)
            s2 = run("softmax2_blocks", p2)
            out = up_to(s2, s1) + s1 + skip1
            s3 = run("softmax3_blocks", out)
            mask_in = up_to(s3, trunk) + trunk
            mask = run("softmax4_blocks", mask_in)
        else:
            p1, _ = pool.apply({}, {}, x, ctx)
            s1 = run("softmax1_blocks", p1)
            mask_in = up_to(s1, trunk) + trunk
            mask = run("softmax2_blocks", mask_in)

        out = (1 + mask) * trunk
        return run("last_blocks", out), new_state


@dataclasses.dataclass(frozen=True)
class ResidualAttentionNet(Layer):
    """``AttentionNets.py:195-234``."""

    stage1_modules: int = 1
    stage2_modules: int = 1
    stage3_modules: int = 1
    feat_dim: int = 512
    out_h: int = 7
    out_w: int = 7

    def _children(self):
        body = [ResidualBlock(64, 256)]
        body += [AttentionModule(256, 3)] * self.stage1_modules
        body += [ResidualBlock(256, 512, 2)]
        body += [AttentionModule(512, 2)] * self.stage2_modules
        body += [ResidualBlock(512, 1024, 2)]
        body += [AttentionModule(1024, 1)] * self.stage3_modules
        body += [ResidualBlock(1024, 2048, 2), ResidualBlock(2048, 2048),
                 ResidualBlock(2048, 2048)]
        return {
            "conv1": Sequential(Conv2d(3, 64, 7, stride=2, padding=3,
                                       use_bias=False,
                                       init_mode="torch_default"),
                                BatchNorm2d(64)),
            "attention_body": Sequential(*body),
            "output_layer.1": Linear(2048 * self.out_h * self.out_w,
                                     self.feat_dim, use_bias=False),
            "output_layer.2": BatchNorm1d(self.feat_dim),
        }

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        new_state = {}
        x, ns = ch["conv1"].apply(params["conv1"], state.get("conv1", {}),
                                  x, ctx)
        new_state["conv1"] = ns
        x = jnp.maximum(x, 0)
        x, ns = ch["attention_body"].apply(
            params["attention_body"], state.get("attention_body", {}), x,
            ctx)
        new_state["attention_body"] = ns
        # torch Flatten over NCHW: converter uses flatten_info on
        # 'output_layer.1' with (out_h, out_w, 2048)
        x = x.reshape(x.shape[0], -1)
        x, _ = ch["output_layer.1"].apply(params["output_layer.1"], {}, x,
                                          ctx)
        x, ns = ch["output_layer.2"].apply(
            params["output_layer.2"], state.get("output_layer.2", {}), x,
            ctx)
        new_state["output_layer.2"] = ns
        return x, new_state


def AttentionNet_56(feat_dim=512, out_h=7, out_w=7):
    return ResidualAttentionNet(1, 1, 1, feat_dim, out_h, out_w)


def AttentionNet_92(feat_dim=512, out_h=7, out_w=7):
    return ResidualAttentionNet(1, 2, 3, feat_dim, out_h, out_w)
