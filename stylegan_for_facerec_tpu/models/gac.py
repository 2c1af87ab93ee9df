"""Demographic-adaptive (GAC / race-aware) modules.

Parity targets:
  * ``/root/reference/backbone/restyle_psp_helpers.py:219-372`` —
    ``Conv2dExtended`` (one-hot demog feature-map concat),
    ``AdaConv2d_faster`` (per-group kernel masks; note its quirk: only
    groups with label > 1 get their own kernel, groups 0 and 1 share
    kernel 0), ``AttBlock`` (per-group channel attention);
  * ``/root/reference/restyle-encoder/models/gac.py`` — ``AdaConv2d``
    (groups >= 1 each get a kernel; similarity-based auto-fusing after
    ``fuse_epoch``), ``IRBlock``, ``ResNetFace`` and the
    ``gac_resnet{18..152}`` factories.

TPU-native formulation: instead of boolean-indexed per-group convs, all
``ndemog`` group convolutions run batched (one conv per group over the
full batch — static shapes) and the per-sample result is gathered by
demographic label. ndemog is small (4), so this trades 4x conv FLOPs for
zero dynamic shapes; groups are class-imbalanced in practice so the
reference's gather-style indexing would still pay worst-case latency.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..nn import (BatchNorm2d, Conv2d, Layer, MaxPool2d, PReLU, Sequential,
                  init_child, initializers)
from .psp import GradualStyleBlock


@dataclasses.dataclass(frozen=True)
class Conv2dExtended(Layer):
    """``restyle_psp_helpers.py:219-235``: concat a one-hot demographic
    feature map, then conv."""

    n_demog: int
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0

    def _children(self):
        return {"conv": Conv2d(self.in_channels + self.n_demog,
                               self.out_channels, self.kernel_size,
                               stride=self.stride, padding=self.padding)}

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, inputs, ctx):
        x, races = inputs
        n, h, w, _ = x.shape
        demog = jax.nn.one_hot(races, self.n_demog, dtype=x.dtype)
        demog = jnp.broadcast_to(demog[:, None, None, :],
                                 (n, h, w, self.n_demog))
        return self._children()["conv"].apply(
            params["conv"], {}, jnp.concatenate([x, demog], axis=-1), ctx)


def _group_conv_select(x, kernels_hwio, labels, stride, padding,
                       kernel_for_label):
    """Run one conv per group kernel over the full batch, gather rows by
    (remapped) label."""
    outs = []
    for g in range(kernels_hwio.shape[0]):
        y = lax.conv_general_dilated(
            x, kernels_hwio[g], (stride, stride),
            [(padding, padding), (padding, padding)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        outs.append(y)
    stacked = jnp.stack(outs)                       # (G, N, h, w, c)
    sel = kernel_for_label(labels)
    return stacked[sel, jnp.arange(x.shape[0])]


@dataclasses.dataclass(frozen=True)
class AdaConv2dFaster(Layer):
    """``restyle_psp_helpers.py:238-318``. Kernel for group g =
    kernel_base * kernel_mask[g]; upstream quirk preserved: groups 0 and 1
    both use mask 0 (the loop guard is ``i > 1``)."""

    ndemog: int
    ic: int
    oc: int
    ks: int
    stride: int = 1
    padding: int = 0
    adap: bool = True

    def init(self, key):
        kb, km = jax.random.split(key)
        # xavier_normal on (oc, ic, ks, ks) / (1, ic, ks, ks), torch layout
        def xavier_normal(k, shape, fan_in, fan_out):
            std = (2.0 / (fan_in + fan_out)) ** 0.5
            return jax.random.normal(k, shape) * std
        rf = self.ks * self.ks
        base = xavier_normal(kb, (self.ks, self.ks, self.ic, self.oc),
                             self.ic * rf, self.oc * rf)
        # the reference repeats the (1, ic, k, k) mask to ndemog groups
        # BEFORE xavier_normal_ (restyle_psp_helpers.py:259-266), so each
        # group draws an INDEPENDENT kernel and torch's fan_out counts
        # the group dim (ndemog * rf)
        g = self.ndemog if self.adap else 1
        mask = xavier_normal(km, (g, self.ks, self.ks, self.ic, 1),
                             self.ic * rf, g * rf)
        return {"kernel_base": base, "kernel_mask": mask}, {}

    def apply(self, params, state, inputs, ctx):
        x, labels = inputs
        base = params["kernel_base"].astype(x.dtype)      # (k,k,ic,oc)
        if not self.adap:
            y = lax.conv_general_dilated(
                x, base, (self.stride, self.stride),
                [(self.padding, self.padding)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y, {}
        mask = params["kernel_mask"].astype(x.dtype)      # (G,k,k,ic,1)
        kernels = base[None] * mask                        # (G,k,k,ic,oc)
        y = _group_conv_select(
            x, kernels, labels, self.stride, self.padding,
            kernel_for_label=lambda l: jnp.where(l > 1, l, 0))
        return y, {}


@dataclasses.dataclass(frozen=True)
class AdaConv2dGAC(AdaConv2dFaster):
    """``gac.py:270-340`` variant: every group >= 1 has its own kernel
    (guard ``i >= 1``); the auto-fusing path (epoch >= fuse_epoch merging
    similar kernels, ``gac.py``) collapses a group to kernel 0 when its
    fuse flag is set — expressed here as a static ``fused_groups`` tuple."""

    fuse_epoch: int = 9
    fused_groups: Tuple[int, ...] = ()

    def apply(self, params, state, inputs, ctx):
        x, labels = inputs
        base = params["kernel_base"].astype(x.dtype)
        if not self.adap:
            y = lax.conv_general_dilated(
                x, base, (self.stride, self.stride),
                [(self.padding, self.padding)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y, {}
        mask = params["kernel_mask"].astype(x.dtype)
        kernels = base[None] * mask

        def remap(l):
            for g in self.fused_groups:
                l = jnp.where(l == g, 0, l)
            return l
        y = _group_conv_select(x, kernels, labels, self.stride,
                               self.padding, kernel_for_label=remap)
        return y, {}


@dataclasses.dataclass(frozen=True)
class AttBlock(Layer):
    """``restyle_psp_helpers.py:321-372``: per-demographic per-channel
    sigmoid gate ('ones' init: sigmoid(0)*2 == identity at init)."""

    nchannel: int
    ndemog: int = 4
    init_strategy: str = "ones"

    def init(self, key):
        if self.init_strategy == "xavier":
            a = initializers.xavier_uniform(
                key, (1, 1, self.nchannel, 1, 1), layout="hwio")
        else:
            a = jnp.zeros((1, 1, self.nchannel, 1, 1))
        a = jnp.tile(a, (self.ndemog, 1, 1, 1, 1))
        return {"att_channel": a}, {}

    def apply(self, params, state, inputs, ctx):
        x, labels = inputs
        att = jax.nn.sigmoid(params["att_channel"].astype(x.dtype))
        if self.init_strategy == "ones":
            att = att * 2
        # (G,1,C,1,1) -> per-sample (C,) gate, broadcast over NHWC
        gate = att[labels][:, 0, :, 0, 0]
        return x * gate[:, None, None, :], {}


@dataclasses.dataclass(frozen=True)
class IRBlockGAC(Layer):
    """``gac.py:29-80``: BN -> adaconv3x3 -> BN -> PReLU -> adaconv3x3 ->
    BN (-> SE) + shortcut -> PReLU (-> Att)."""

    inplanes: int
    planes: int
    stride: int = 1
    ndemog: int = 4
    adap: bool = False
    use_att: bool = False

    def _children(self):
        d = {"bn0": BatchNorm2d(self.inplanes),
             "conv1": AdaConv2dGAC(self.ndemog, self.inplanes, self.planes,
                                   3, self.stride, 1, adap=self.adap),
             "bn1": BatchNorm2d(self.planes),
             "prelu1": PReLU(self.planes),
             "conv2": AdaConv2dGAC(self.ndemog, self.planes, self.planes,
                                   3, 1, 1, adap=self.adap),
             "bn2": BatchNorm2d(self.planes),
             "prelu2": PReLU(self.planes)}
        if self.stride != 1 or self.inplanes != self.planes:
            d["downsample"] = Sequential(
                Conv2d(self.inplanes, self.planes, 1, stride=self.stride,
                       use_bias=False), BatchNorm2d(self.planes))
        if self.use_att:
            d["att"] = AttBlock(self.planes, self.ndemog)
        return d

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, inputs, ctx):
        x, labels = inputs
        ch = self._children()
        new_state = {}

        def run(name, h, with_labels=False):
            s = state.get(name, {})
            inp = (h, labels) if with_labels else h
            h, ns = ch[name].apply(params[name], s, inp, ctx)
            if s or ns:
                new_state[name] = ns
            return h

        residual = x
        out = run("bn0", x)
        out = run("conv1", out, with_labels=True)
        out = run("bn1", out)
        out = run("prelu1", out)
        out = run("conv2", out, with_labels=True)
        out = run("bn2", out)
        if "downsample" in ch:
            residual = run("downsample", x)
        out = run("prelu2", out + residual)
        if self.use_att:
            out = run("att", out, with_labels=True)
        return out, new_state


@dataclasses.dataclass(frozen=True)
class ResNetFaceGAC(Layer):
    """``gac.py:405-520``: 6ch input, IR blocks with adaptive convs and
    attention, pSp style heads on the final 7x7 map (style spatial 16 as
    upstream — 4 stride-2 convs collapse 7x7 to 1x1)."""

    layers: Tuple[int, int, int, int] = (2, 2, 2, 2)
    ndemog: int = 4
    n_styles: int = 18
    adap: bool = False
    use_att: bool = False
    in_channels: int = 6

    def _children(self):
        d = {"conv1": Conv2d(self.in_channels, 64, 3, padding=1,
                             use_bias=False),
             "bn1": BatchNorm2d(64),
             "prelu": PReLU(64)}
        inplanes = 64
        for li, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers), 1):
            stride = 1 if li == 1 else 2
            seq = []
            for b in range(blocks):
                seq.append(IRBlockGAC(inplanes, planes,
                                      stride if b == 0 else 1,
                                      self.ndemog, self.adap,
                                      self.use_att))
                inplanes = planes
            for b, blk in enumerate(seq):
                d[f"layer{li}.{b}"] = blk
        d["bn4"] = BatchNorm2d(512)
        for i in range(self.n_styles):
            d[f"styles.{i}"] = GradualStyleBlock(512, 512, 16)
        return d

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, inputs, ctx):
        x, labels = inputs
        ch = self._children()
        new_state = {}

        def run(name, h, with_labels=False):
            s = state.get(name, {})
            inp = (h, labels) if with_labels else h
            h, ns = ch[name].apply(params[name], s, inp, ctx)
            if s or ns:
                new_state[name] = ns
            return h

        x = run("prelu", run("bn1", run("conv1", x)))
        x, _ = MaxPool2d(2, 2).apply({}, {}, x, ctx)
        for li, blocks in enumerate(self.layers, 1):
            for b in range(blocks):
                x = run(f"layer{li}.{b}", x, with_labels=True)
        x = run("bn4", x)
        latents = []
        for i in range(self.n_styles):
            y, _ = ch[f"styles.{i}"].apply(params[f"styles.{i}"], {}, x,
                                           ctx)
            latents.append(y)
        return jnp.stack(latents, axis=1), new_state


def gac_resnet18(**kw):
    return ResNetFaceGAC(layers=(2, 2, 2, 2), **kw)


def gac_resnet34(**kw):
    return ResNetFaceGAC(layers=(3, 4, 6, 3), **kw)


def gac_resnet50(**kw):
    return ResNetFaceGAC(layers=(3, 4, 14, 3), **kw)


def gac_resnet100(**kw):
    return ResNetFaceGAC(layers=(3, 13, 30, 3), **kw)


def gac_resnet152(**kw):
    return ResNetFaceGAC(layers=(3, 8, 36, 3), **kw)
