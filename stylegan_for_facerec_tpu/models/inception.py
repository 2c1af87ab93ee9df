"""InceptionV3 feature extractor for FID (pytorch-fid/torchvision layout).

The reference's stage-1 recipe scores generators with InceptionV3-pool3
FID (stylegan2-ada-lightning's validation loop; the reference delegates
stage-1 to that repo, ``/root/reference/README.md:118-123``). Inception
weights are not downloadable in this offline image, so ``eval/fid.py``
defaults to IR-SE-50 embedding features — this module closes the gap the
day real weights are available (VERDICT r3 next #6): it reproduces the
pytorch-fid network graph with param-tree paths mirroring the torchvision
``inception_v3`` state_dict (``Conv2d_1a_3x3.conv.weight``,
``Mixed_5b.branch1x1.bn.running_mean``, ...), so
``utils.torch_convert.from_torch(InceptionV3(), state_dict)`` is the same
mechanical key walk every other model family uses. Load either the
torchvision ImageNet checkpoint or pytorch-fid's
``pt_inception-2015-12-05`` weights file (same key schema).

``fid_variant=True`` (default) reproduces pytorch-fid's FIDInception
blocks — the network the published FID numbers use: the in-block 3x3/s1
average pools exclude padding from the divisor
(``count_include_pad=False``), and Mixed_7c's pool branch is a MAX pool.
``fid_variant=False`` is vanilla torchvision.

Input contract: NHWC float in [-1, 1] (pytorch-fid's ``normalize_input``
scaling), any spatial size; ``resize_input=True`` bilinearly resizes to
299 as pytorch-fid does. Output: (B, 2048) pool3 features for
``eval.fid.embedding_fid``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from ..nn import AvgPool2d, BatchNorm, Conv2d, Layer, MaxPool2d, init_child
from ..ops.image import resize_bilinear


@dataclasses.dataclass(frozen=True)
class BasicConv2d(Layer):
    """conv(bias-free) + BN(eps=1e-3) + relu — torchvision BasicConv2d."""

    in_ch: int
    out_ch: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = 1
    padding: Tuple[int, int] = 0

    def _children(self):
        return {"conv": Conv2d(self.in_ch, self.out_ch, self.kernel,
                               stride=self.stride, padding=self.padding,
                               use_bias=False),
                "bn": BatchNorm(self.out_ch, eps=1e-3)}

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        x, _ = ch["conv"].apply(params["conv"], {}, x, ctx)
        x, bst = ch["bn"].apply(params["bn"], state["bn"], x, ctx)
        return jnp.maximum(x, 0), {"bn": bst}


class _Block(Layer):
    """Shared concat-of-branches plumbing; subclasses define
    ``_children()`` (param branches), ``_pools()`` (parameter-free pool
    layers by name) and ``_branches()`` (list of (child-name chains,
    pool-or-None) in torchvision concat order)."""

    def init(self, key):
        return init_child(self._children(), key)

    def _run(self, params, state, x, ctx, chain):
        ch = self._children()
        st = {}
        for name in chain:
            x, s = ch[name].apply(params[name], state[name], x, ctx)
            st[name] = s
        return x, st

    def apply(self, params, state, x, ctx):
        outs, new_state = [], {}
        for chain, pool in self._branches():
            y = x
            if pool is not None:
                y, _ = pool.apply({}, {}, y, ctx)
            y, st = self._run(params, state, y, ctx, chain)
            outs.append(y)
            new_state.update(st)
        return jnp.concatenate(outs, axis=-1), new_state


def _avg3(fid: bool) -> AvgPool2d:
    return AvgPool2d(3, stride=1, padding=1, count_include_pad=not fid)


@dataclasses.dataclass(frozen=True)
class InceptionA(_Block):
    in_ch: int
    pool_features: int
    fid: bool = True

    def _children(self):
        c = self.in_ch
        return {
            "branch1x1": BasicConv2d(c, 64, 1),
            "branch5x5_1": BasicConv2d(c, 48, 1),
            "branch5x5_2": BasicConv2d(48, 64, 5, padding=2),
            "branch3x3dbl_1": BasicConv2d(c, 64, 1),
            "branch3x3dbl_2": BasicConv2d(64, 96, 3, padding=1),
            "branch3x3dbl_3": BasicConv2d(96, 96, 3, padding=1),
            "branch_pool": BasicConv2d(c, self.pool_features, 1),
        }

    def _branches(self):
        return [(["branch1x1"], None),
                (["branch5x5_1", "branch5x5_2"], None),
                (["branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"],
                 None),
                (["branch_pool"], _avg3(self.fid))]


@dataclasses.dataclass(frozen=True)
class InceptionB(_Block):
    in_ch: int

    def _children(self):
        c = self.in_ch
        return {
            "branch3x3": BasicConv2d(c, 384, 3, stride=2),
            "branch3x3dbl_1": BasicConv2d(c, 64, 1),
            "branch3x3dbl_2": BasicConv2d(64, 96, 3, padding=1),
            "branch3x3dbl_3": BasicConv2d(96, 96, 3, stride=2),
        }

    def _branches(self):
        return [(["branch3x3"], None),
                (["branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"],
                 None),
                ([], MaxPool2d(3, stride=2))]


@dataclasses.dataclass(frozen=True)
class InceptionC(_Block):
    in_ch: int
    c7: int
    fid: bool = True

    def _children(self):
        c, c7 = self.in_ch, self.c7
        return {
            "branch1x1": BasicConv2d(c, 192, 1),
            "branch7x7_1": BasicConv2d(c, c7, 1),
            "branch7x7_2": BasicConv2d(c7, c7, (1, 7), padding=(0, 3)),
            "branch7x7_3": BasicConv2d(c7, 192, (7, 1), padding=(3, 0)),
            "branch7x7dbl_1": BasicConv2d(c, c7, 1),
            "branch7x7dbl_2": BasicConv2d(c7, c7, (7, 1), padding=(3, 0)),
            "branch7x7dbl_3": BasicConv2d(c7, c7, (1, 7), padding=(0, 3)),
            "branch7x7dbl_4": BasicConv2d(c7, c7, (7, 1), padding=(3, 0)),
            "branch7x7dbl_5": BasicConv2d(c7, 192, (1, 7), padding=(0, 3)),
            "branch_pool": BasicConv2d(c, 192, 1),
        }

    def _branches(self):
        return [(["branch1x1"], None),
                (["branch7x7_1", "branch7x7_2", "branch7x7_3"], None),
                (["branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                  "branch7x7dbl_4", "branch7x7dbl_5"], None),
                (["branch_pool"], _avg3(self.fid))]


@dataclasses.dataclass(frozen=True)
class InceptionD(_Block):
    in_ch: int

    def _children(self):
        c = self.in_ch
        return {
            "branch3x3_1": BasicConv2d(c, 192, 1),
            "branch3x3_2": BasicConv2d(192, 320, 3, stride=2),
            "branch7x7x3_1": BasicConv2d(c, 192, 1),
            "branch7x7x3_2": BasicConv2d(192, 192, (1, 7), padding=(0, 3)),
            "branch7x7x3_3": BasicConv2d(192, 192, (7, 1), padding=(3, 0)),
            "branch7x7x3_4": BasicConv2d(192, 192, 3, stride=2),
        }

    def _branches(self):
        return [(["branch3x3_1", "branch3x3_2"], None),
                (["branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3",
                  "branch7x7x3_4"], None),
                ([], MaxPool2d(3, stride=2))]


@dataclasses.dataclass(frozen=True)
class InceptionE(_Block):
    """pool="avg" is torchvision / pytorch-fid's Mixed_7b
    (FIDInceptionE_1); pool="max" is pytorch-fid's Mixed_7c
    (FIDInceptionE_2)."""

    in_ch: int
    pool: str = "avg"
    fid: bool = True

    def _children(self):
        c = self.in_ch
        return {
            "branch1x1": BasicConv2d(c, 320, 1),
            "branch3x3_1": BasicConv2d(c, 384, 1),
            "branch3x3_2a": BasicConv2d(384, 384, (1, 3), padding=(0, 1)),
            "branch3x3_2b": BasicConv2d(384, 384, (3, 1), padding=(1, 0)),
            "branch3x3dbl_1": BasicConv2d(c, 448, 1),
            "branch3x3dbl_2": BasicConv2d(448, 384, 3, padding=1),
            "branch3x3dbl_3a": BasicConv2d(384, 384, (1, 3),
                                           padding=(0, 1)),
            "branch3x3dbl_3b": BasicConv2d(384, 384, (3, 1),
                                           padding=(1, 0)),
            "branch_pool": BasicConv2d(c, 192, 1),
        }

    def apply(self, params, state, x, ctx):
        new_state = {}

        def run(name, y):
            z, st = self._children()[name].apply(params[name], state[name],
                                                 y, ctx)
            new_state[name] = st
            return z

        b1 = run("branch1x1", x)
        b3 = run("branch3x3_1", x)
        b3 = jnp.concatenate([run("branch3x3_2a", b3),
                              run("branch3x3_2b", b3)], axis=-1)
        bd = run("branch3x3dbl_1", x)
        bd = run("branch3x3dbl_2", bd)
        bd = jnp.concatenate([run("branch3x3dbl_3a", bd),
                              run("branch3x3dbl_3b", bd)], axis=-1)
        pool = (MaxPool2d(3, stride=1, padding=1) if self.pool == "max"
                else _avg3(self.fid))
        bp, _ = pool.apply({}, {}, x, ctx)
        bp = run("branch_pool", bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1), new_state


@dataclasses.dataclass(frozen=True)
class InceptionV3(Layer):
    """Pool3 (2048-d) InceptionV3 feature extractor; see module docstring
    for the weight-loading and input contracts."""

    fid_variant: bool = True
    resize_input: bool = True

    def _children(self):
        f = self.fid_variant
        return {
            "Conv2d_1a_3x3": BasicConv2d(3, 32, 3, stride=2),
            "Conv2d_2a_3x3": BasicConv2d(32, 32, 3),
            "Conv2d_2b_3x3": BasicConv2d(32, 64, 3, padding=1),
            "Conv2d_3b_1x1": BasicConv2d(64, 80, 1),
            "Conv2d_4a_3x3": BasicConv2d(80, 192, 3),
            "Mixed_5b": InceptionA(192, 32, fid=f),
            "Mixed_5c": InceptionA(256, 64, fid=f),
            "Mixed_5d": InceptionA(288, 64, fid=f),
            "Mixed_6a": InceptionB(288),
            "Mixed_6b": InceptionC(768, 128, fid=f),
            "Mixed_6c": InceptionC(768, 160, fid=f),
            "Mixed_6d": InceptionC(768, 160, fid=f),
            "Mixed_6e": InceptionC(768, 192, fid=f),
            "Mixed_7a": InceptionD(768),
            "Mixed_7b": InceptionE(1280, pool="avg", fid=f),
            "Mixed_7c": InceptionE(2048,
                                   pool="max" if f else "avg", fid=f),
        }

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        if self.resize_input and x.shape[1:3] != (299, 299):
            x = resize_bilinear(x, 299, 299)
        ch = self._children()
        new_state = {}
        pool = MaxPool2d(3, stride=2)

        def run(name, y):
            z, st = ch[name].apply(params[name], state[name], y, ctx)
            new_state[name] = st
            return z

        x = run("Conv2d_1a_3x3", x)
        x = run("Conv2d_2a_3x3", x)
        x = run("Conv2d_2b_3x3", x)
        x, _ = pool.apply({}, {}, x, ctx)
        x = run("Conv2d_3b_1x1", x)
        x = run("Conv2d_4a_3x3", x)
        x, _ = pool.apply({}, {}, x, ctx)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = run(name, x)
        return jnp.mean(x, axis=(1, 2)), new_state
