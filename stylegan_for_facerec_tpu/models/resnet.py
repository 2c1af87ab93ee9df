"""Standard ResNet-50/101/152 face-recognition backbones.

Parity target: ``/root/reference/backbone/model_resnet.py``: conv7x7/s2 ->
BN -> ReLU -> maxpool3x3/s2 -> 4 stages -> BN2d -> Dropout ->
Linear(2048*4*4 -> 512) -> BN1d; kaiming init, zero-init of each block's
final BN (``model_resnet.py:118-129``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn import (BatchNorm1d, BatchNorm2d, Conv2d, Layer, Linear,
                  MaxPool2d, ReLU, Sequential, init_child)


def _conv3x3(cin, cout, stride=1):
    return Conv2d(cin, cout, 3, stride=stride, padding=1, use_bias=False,
                  init_mode="torch_default")


def _conv1x1(cin, cout, stride=1):
    return Conv2d(cin, cout, 1, stride=stride, use_bias=False,
                  init_mode="torch_default")


@dataclasses.dataclass(frozen=True)
class BasicBlock(Layer):
    """``model_resnet.py:21-50``."""

    expansion = 1
    inplanes: int
    planes: int
    stride: int = 1
    has_downsample: bool = False

    def _children(self):
        d = {"conv1": _conv3x3(self.inplanes, self.planes, self.stride),
             "bn1": BatchNorm2d(self.planes),
             "conv2": _conv3x3(self.planes, self.planes),
             "bn2": BatchNorm2d(self.planes)}
        if self.has_downsample:
            d["downsample"] = Sequential(
                _conv1x1(self.inplanes, self.planes, self.stride),
                BatchNorm2d(self.planes))
        return d

    def init(self, key):
        params, state = init_child(self._children(), key)
        # zero-init last BN (model_resnet.py:124-129)
        params["bn2"]["weight"] = jnp.zeros_like(params["bn2"]["weight"])
        return params, state

    def apply(self, params, state, x, ctx):
        ch = self._children()
        new_state = {}

        def run(name, h):
            s = state.get(name, {})
            h, ns = ch[name].apply(params[name], s, h, ctx)
            if s or ns:
                new_state[name] = ns
            return h

        out = run("conv1", x)
        out = run("bn1", out)
        out = jnp.maximum(out, 0)
        out = run("conv2", out)
        out = run("bn2", out)
        identity = run("downsample", x) if self.has_downsample else x
        return jnp.maximum(out + identity, 0), new_state


@dataclasses.dataclass(frozen=True)
class Bottleneck(Layer):
    """``model_resnet.py:53-89``."""

    expansion = 4
    inplanes: int
    planes: int
    stride: int = 1
    has_downsample: bool = False

    def _children(self):
        e = self.expansion
        d = {"conv1": _conv1x1(self.inplanes, self.planes),
             "bn1": BatchNorm2d(self.planes),
             "conv2": _conv3x3(self.planes, self.planes, self.stride),
             "bn2": BatchNorm2d(self.planes),
             "conv3": _conv1x1(self.planes, self.planes * e),
             "bn3": BatchNorm2d(self.planes * e)}
        if self.has_downsample:
            d["downsample"] = Sequential(
                _conv1x1(self.inplanes, self.planes * e, self.stride),
                BatchNorm2d(self.planes * e))
        return d

    def init(self, key):
        params, state = init_child(self._children(), key)
        params["bn3"]["weight"] = jnp.zeros_like(params["bn3"]["weight"])
        return params, state

    def apply(self, params, state, x, ctx):
        ch = self._children()
        new_state = {}

        def run(name, h):
            s = state.get(name, {})
            h, ns = ch[name].apply(params[name], s, h, ctx)
            if s or ns:
                new_state[name] = ns
            return h

        out = jnp.maximum(run("bn1", run("conv1", x)), 0)
        out = jnp.maximum(run("bn2", run("conv2", out)), 0)
        out = run("bn3", run("conv3", out))
        identity = run("downsample", x) if self.has_downsample else x
        return jnp.maximum(out + identity, 0), new_state


@dataclasses.dataclass(frozen=True)
class ResNet(Layer):
    """``model_resnet.py:91-164``."""

    input_size: int = 112
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    block: str = "bottleneck"        # 'basic' | 'bottleneck'
    emb_size: int = 512
    drop_ratio: float = 0.5

    def _make_stage(self, name, inplanes, planes, blocks, stride):
        cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        e = cls.expansion
        layers = [cls(inplanes, planes, stride,
                      has_downsample=(stride != 1 or
                                      inplanes != planes * e))]
        for _ in range(1, blocks):
            layers.append(cls(planes * e, planes))
        return Sequential(*layers), planes * e

    def _children(self):
        d = {"conv1": Conv2d(3, 64, 7, stride=2, padding=3, use_bias=False,
                             init_mode="torch_default"),
             "bn1": BatchNorm2d(64)}
        inplanes = 64
        for i, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers), 1):
            stride = 1 if i == 1 else 2
            d[f"layer{i}"], inplanes = self._make_stage(
                f"layer{i}", inplanes, planes, blocks, stride)
        sp = 4 if self.input_size == 112 else 8
        d["bn_o1"] = BatchNorm2d(inplanes)
        d["fc"] = Linear(inplanes * sp * sp, self.emb_size)
        d["bn_o2"] = BatchNorm1d(self.emb_size)
        return d

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        from ..nn import Dropout
        ch = self._children()
        new_state = {}

        def run(name, h):
            s = state.get(name, {})
            h, ns = ch[name].apply(params[name], s, h, ctx)
            if s or ns:
                new_state[name] = ns
            return h

        x = jnp.maximum(run("bn1", run("conv1", x)), 0)
        x, _ = MaxPool2d(3, 2, padding=1).apply({}, {}, x, ctx)
        for i in (1, 2, 3, 4):
            x = run(f"layer{i}", x)
        x = run("bn_o1", x)
        x, _ = Dropout(self.drop_ratio).apply({}, {}, x, ctx)
        # torch flattens (C,H,W)-major; transpose for weight parity
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = run("fc", x)
        x = run("bn_o2", x)
        return x, new_state


def resnet50_pooled_features(model: "ResNet", params, state, x, ctx):
    """Global-average-pooled 2048-d trunk features — the MoCo feature path
    (``criteria/moco_loss.py:36-45``: torchvision resnet50 minus fc).
    Shares the conv trunk of ``ResNet``; skips the face-rec head."""
    from ..nn import Dropout
    ch = model._children()
    new_state = {}

    def run(name, h):
        s = state.get(name, {})
        h, ns = ch[name].apply(params[name], s, h, ctx)
        if s or ns:
            new_state[name] = ns
        return h

    x = jnp.maximum(run("bn1", run("conv1", x)), 0)
    x, _ = MaxPool2d(3, 2, padding=1).apply({}, {}, x, ctx)
    for i in (1, 2, 3, 4):
        x = run(f"layer{i}", x)
    return jnp.mean(x, axis=(1, 2)), new_state


def ResNet_50(input_size=112, **kw):
    return ResNet(input_size, (3, 4, 6, 3), "bottleneck", **kw)


def ResNet_101(input_size=112, **kw):
    return ResNet(input_size, (3, 4, 23, 3), "bottleneck", **kw)


def ResNet_152(input_size=112, **kw):
    return ResNet(input_size, (3, 8, 36, 3), "bottleneck", **kw)
