"""ReStyle pSp encoder stack: stage-2 inversion model and stage-3
face-recognition backbone.

Parity targets:
  * ``/root/reference/backbone/restyle_psp.py`` — ``GradualStyleBlock``
    (:25-49), ``BackboneEncoder`` (:52-92), ``PSPOutputLayer`` (:95-115),
    ``BackboneEncoderDiffHead`` (:118-216), stage-3 ``pSp`` (:358-478);
  * ``/root/reference/restyle-encoder/models/psp.py`` — the stage-2 pSp
    (encoder + frozen generator + residual latent step, :79-119);
  * ``/root/reference/restyle-encoder/models/encoders/restyle_psp_encoders.py``.

Stage-3 semantics: the encoder alone (decoder discarded), input resized to
112 and channel-concatenated with a fixed average image (6ch), IR-SE-50 body,
'facerec' output head -> 512-d embedding. A single forward — no iterative
refinement at stage 3 (``restyle_psp.py:439-452``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import (BatchNorm1d, BatchNorm2d, Conv2d, Ctx, Dropout, Flatten,
                  Layer, LeakyReLU, Linear, PReLU, Sequential, init_child)
from ..ops.image import resize_bilinear
from .irse import Backbone, BottleneckIR, get_blocks
from .stylegan2 import EqualLinear
from .stylegan2_ada import Generator as GeneratorAda


@dataclasses.dataclass(frozen=True)
class GradualStyleBlock(Layer):
    """map2style head (``restyle_psp.py:25-49``): log2(spatial) stride-2
    convs with LeakyReLU(0.01) down to 1x1, then EqualLinear."""

    in_c: int
    out_c: int
    spatial: int

    def _children(self):
        num_pools = int(np.log2(self.spatial))
        convs = [Conv2d(self.in_c, self.out_c, 3, stride=2, padding=1,
                        init_mode="torch_default"), LeakyReLU()]
        for _ in range(num_pools - 1):
            convs += [Conv2d(self.out_c, self.out_c, 3, stride=2, padding=1,
                             init_mode="torch_default"), LeakyReLU()]
        return {"convs": Sequential(*convs),
                "linear": EqualLinear(self.out_c, self.out_c, lr_mul=1)}

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        x, _ = ch["convs"].apply(params["convs"], {}, x, ctx)
        if x.shape[1] != 1 or x.shape[2] != 1:
            raise ValueError(
                f"GradualStyleBlock(spatial={self.spatial}) ended at "
                f"{x.shape[1]}x{x.shape[2]}, not 1x1 — the encoder's "
                f"style_spatial does not match the input resolution "
                f"(use style_spatial_for(input_size)); reshaping would "
                f"silently corrupt the batch dimension")
        x = x.reshape(-1, self.out_c)
        x, _ = ch["linear"].apply(params["linear"], {}, x, ctx)
        return x, {}


@dataclasses.dataclass(frozen=True)
class PSPOutputLayer(Layer):
    """n_styles parallel GradualStyleBlocks stacked (``restyle_psp.py:95-115``)."""

    in_c: int
    out_c: int
    spatial: int
    n_styles: int = 18

    def _children(self):
        return {f"styles.{i}": GradualStyleBlock(self.in_c, self.out_c,
                                                 self.spatial)
                for i in range(self.n_styles)}

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        latents = []
        for i in range(self.n_styles):
            y, _ = ch[f"styles.{i}"].apply(params[f"styles.{i}"], {}, x, ctx)
            latents.append(y)
        return jnp.stack(latents, axis=1), {}


@dataclasses.dataclass(frozen=True)
class BackboneEncoder(Layer):
    """Stage-2 ReStyle encoder (``restyle_psp_encoders.py:10-55``): IR-SE
    body over ``input_nc``-channel input, n_styles map2style heads on the
    final feature map. The vendored fork uses style spatial 9 (3 stride-2
    convs, for 112x112 inputs / 7x7 maps, ``restyle_psp_encoders.py:42``);
    upstream ReStyle used 16 (256x256 inputs)."""

    num_layers: int = 50
    mode: str = "ir_se"
    n_styles: int = 18
    input_nc: int = 6
    style_spatial: int = 9

    def _children(self):
        se = self.mode == "ir_se"
        body = [BottleneckIR(i, d, s, se=se)
                for i, d, s in get_blocks(self.num_layers)]
        d = {
            "input_layer": Sequential(
                Conv2d(self.input_nc, 64, 3, padding=1, use_bias=False),
                BatchNorm2d(64), PReLU(64)),
            "body": Sequential(*body),
        }
        for i in range(self.n_styles):
            d[f"styles.{i}"] = GradualStyleBlock(512, 512,
                                                 self.style_spatial)
        return d

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        new_state = {}
        for name in ("input_layer", "body"):
            x, ns = ch[name].apply(params[name], state.get(name, {}), x, ctx)
            new_state[name] = ns
        latents = []
        for i in range(self.n_styles):
            y, _ = ch[f"styles.{i}"].apply(params[f"styles.{i}"], {}, x, ctx)
            latents.append(y)
        return jnp.stack(latents, axis=1), new_state


@dataclasses.dataclass(frozen=True)
class GradualStyleEncoder(Layer):
    """Original pixel2style2pixel FPN encoder
    (``restyle-encoder/models/encoders/fpn_encoders.py:11-82``): IR-SE body
    with feature taps at block indices 6/20/23, lateral 1x1 convs, and
    coarse/mid/fine style groups on the pyramid levels (align-corners
    bilinear upsample-add)."""

    num_layers: int = 50
    mode: str = "ir_se"
    n_styles: int = 18
    input_nc: int = 6
    coarse_ind: int = 3
    middle_ind: int = 7

    def _children(self):
        se = self.mode == "ir_se"
        body = [BottleneckIR(i, d, s, se=se)
                for i, d, s in get_blocks(self.num_layers)]
        d = {
            "input_layer": Sequential(
                Conv2d(self.input_nc, 64, 3, padding=1, use_bias=False),
                BatchNorm2d(64), PReLU(64)),
            "body": Sequential(*body),
            "latlayer1": Conv2d(256, 512, 1, init_mode="torch_default"),
            "latlayer2": Conv2d(128, 512, 1, init_mode="torch_default"),
        }
        for i in range(self.n_styles):
            spatial = 16 if i < self.coarse_ind else \
                (32 if i < self.middle_ind else 64)
            d[f"styles.{i}"] = GradualStyleBlock(512, 512, spatial)
        return d

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        from ..ops.image import resize_bilinear_align_corners
        ch = self._children()
        new_state = {}
        x, ns = ch["input_layer"].apply(params["input_layer"],
                                        state.get("input_layer", {}), x,
                                        ctx)
        new_state["input_layer"] = ns
        body = ch["body"].layers
        bp = params["body"]
        bs = state.get("body", {})
        nbs = {}
        c1 = c2 = c3 = None
        for i, lyr in enumerate(body):
            s_i = bs.get(str(i), {})
            x, ns = lyr.apply(bp[str(i)], s_i, x, ctx)
            if s_i or ns:
                nbs[str(i)] = ns
            if i == 6:
                c1 = x
            elif i == 20:
                c2 = x
            elif i == 23:
                c3 = x
        new_state["body"] = nbs

        def style(i, feat):
            y, _ = ch[f"styles.{i}"].apply(params[f"styles.{i}"], {}, feat,
                                           ctx)
            return y

        latents = [style(j, c3) for j in range(self.coarse_ind)]
        l1, _ = ch["latlayer1"].apply(params["latlayer1"], {}, c2, ctx)
        p2 = resize_bilinear_align_corners(c3, l1.shape[1], l1.shape[2]) + l1
        latents += [style(j, p2)
                    for j in range(self.coarse_ind, self.middle_ind)]
        l2, _ = ch["latlayer2"].apply(params["latlayer2"], {}, c1, ctx)
        p1 = resize_bilinear_align_corners(p2, l2.shape[1], l2.shape[2]) + l2
        latents += [style(j, p1)
                    for j in range(self.middle_ind, self.n_styles)]
        return jnp.stack(latents, axis=1), new_state


@dataclasses.dataclass(frozen=True)
class BackboneEncoderDiffHead(Layer):
    """``restyle_psp.py:118-216``: 6-channel input layer, IR-SE body,
    switchable output head ('facerec' | 'pSp' | 'both')."""

    num_layers: int = 50
    mode: str = "ir_se"
    n_styles: int = 18
    emb_size: int = 512
    input_size: int = 112
    output_layer_type: str = "facerec"
    block_dropout: Optional[float] = None
    in_channels: int = 6

    @property
    def _end_spatial(self) -> int:
        sp = self.input_size
        for _ in range(4):
            sp = -(-sp // 2)
        return sp

    def _children(self):
        se = self.mode == "ir_se"
        body = [BottleneckIR(i, d, s, se=se, dropout=self.block_dropout)
                for i, d, s in get_blocks(self.num_layers)]
        d = {
            "input_layer": Sequential(
                Conv2d(self.in_channels, 64, 3, padding=1, use_bias=False),
                BatchNorm2d(64), PReLU(64)),
            "body": Sequential(*body),
        }
        sp = self._end_spatial
        facerec_head = Sequential(
            BatchNorm2d(512), Dropout(0.5), Flatten(),
            Linear(512 * sp * sp, self.emb_size), BatchNorm1d(self.emb_size))
        if self.output_layer_type == "facerec":
            d["output_layer"] = facerec_head
        elif self.output_layer_type == "pSp":
            d["output_layer"] = PSPOutputLayer(512, 512, 9, self.n_styles)
        elif self.output_layer_type == "both":
            d["output_layer_facerec"] = facerec_head
            d["output_layer_psp"] = PSPOutputLayer(512, 512, 9,
                                                   self.n_styles)
        else:
            raise ValueError(self.output_layer_type)
        return d

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        if x.shape[1] != self.input_size:
            x = resize_bilinear(x, self.input_size, self.input_size)
        new_state = {}
        for name in ("input_layer", "body"):
            x, ns = ch[name].apply(params[name], state.get(name, {}), x, ctx)
            new_state[name] = ns
        if self.output_layer_type in ("facerec", "pSp"):
            x, ns = ch["output_layer"].apply(params["output_layer"],
                                             state.get("output_layer", {}),
                                             x, ctx)
            new_state["output_layer"] = ns
            return x, new_state
        xf, nsf = ch["output_layer_facerec"].apply(
            params["output_layer_facerec"],
            state.get("output_layer_facerec", {}), x, ctx)
        xp, _ = ch["output_layer_psp"].apply(params["output_layer_psp"], {},
                                             x, ctx)
        new_state["output_layer_facerec"] = nsf
        return {"facerec": xf, "pSp": xp}, new_state


def _resnet34_trunk():
    """torchvision resnet34 layer1-4 flattened (the reference initializes
    from pretrained torchvision weights and re-maps module names,
    ``restyle_psp.py:321-338``). BasicBlock stacks: 3/4/6/3."""
    from .resnet import BasicBlock
    blocks = []
    inplanes = 64
    for planes, n, stride in ((64, 3, 1), (128, 4, 2), (256, 6, 2),
                              (512, 3, 2)):
        for b in range(n):
            s = stride if b == 0 else 1
            blocks.append(BasicBlock(
                inplanes, planes, s,
                has_downsample=(s != 1 or inplanes != planes)))
            inplanes = planes
    return Sequential(*blocks)


@dataclasses.dataclass(frozen=True)
class ResNetBackboneEncoder(Layer):
    """``restyle_psp_encoders.py:58-98`` / ``restyle_psp.py:219-259``:
    conv7x7/s2 -> BN -> PReLU -> resnet34 trunk -> n_styles map2style
    heads (spatial 16)."""

    n_styles: int = 18
    input_nc: int = 6
    output_layer_type: str = "pSp"   # 'pSp' | 'facerec'
    emb_size: int = 512

    def _children(self):
        d = {"conv1": Conv2d(self.input_nc, 64, 7, stride=2, padding=3,
                             use_bias=False, init_mode="torch_default"),
             "bn1": BatchNorm2d(64),
             "relu": PReLU(64),
             "body": _resnet34_trunk()}
        if self.output_layer_type == "facerec":
            d["output_layer"] = Sequential(
                BatchNorm2d(512), Dropout(0.5), Flatten(),
                Linear(512 * 7 * 7, self.emb_size),
                BatchNorm1d(self.emb_size))
        else:
            for i in range(self.n_styles):
                d[f"styles.{i}"] = GradualStyleBlock(512, 512, 16)
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

        x = run("relu", run("bn1", run("conv1", x)))
        x = run("body", x)
        if self.output_layer_type == "facerec":
            return run("output_layer", x), new_state
        latents = []
        for i in range(self.n_styles):
            y, _ = ch[f"styles.{i}"].apply(params[f"styles.{i}"], {}, x,
                                           ctx)
            latents.append(y)
        return jnp.stack(latents, axis=1), new_state


@dataclasses.dataclass(frozen=True)
class PSpFaceRec(Layer):
    """Stage-3 pSp backbone (``restyle_psp.py:358-478``): encoder-only with
    a fixed average image concatenated channel-wise. ``apply`` takes the
    input batch; the avg image (112x112x3 in [-1,1], from the stage-2
    coach's export, ``coach_restyle_psp.py:88``) lives in state so it ships
    with checkpoints."""

    size: int = 112
    num_layers: int = 50
    emb_size: int = 512
    block_dropout: Optional[float] = None
    use_avg_image: bool = True

    def _children(self):
        return {"encoder": BackboneEncoderDiffHead(
            self.num_layers, "ir_se", input_size=self.size,
            emb_size=self.emb_size, block_dropout=self.block_dropout)}

    def init(self, key):
        params, state = init_child(self._children(), key)
        if self.use_avg_image:
            state["avg_image"] = jnp.zeros((self.size, self.size, 3))
        return params, state

    def apply(self, params, state, x, ctx):
        if x.shape[1] != self.size:
            x = resize_bilinear(x, self.size, self.size)
        if self.use_avg_image:
            avg = jnp.broadcast_to(state["avg_image"].astype(x.dtype)[None],
                                   x.shape)
            x = jnp.concatenate([x, avg], axis=-1)
        enc = self._children()["encoder"]
        y, ns = enc.apply(params["encoder"], state["encoder"], x, ctx)
        new_state = dict(state)
        new_state["encoder"] = ns
        return y, new_state


# the encoder registry of the reference inference scripts
# (restyle_psp.py:316-319 ENCODER_TYPES + psp.py:37-52 set_encoder)
ENCODER_TYPES = {
    "pSp": ("GradualStyleEncoder", "ResNetGradualStyleEncoder",
            "BackboneEncoder", "ResNetBackboneEncoder"),
    "e4e": ("ProgressiveBackboneEncoder",
            "ResNetProgressiveBackboneEncoder"),
}


def build_encoder(encoder_type: str, n_styles: int, input_nc: int = 6,
                  num_layers: int = 50):
    """Factory mirroring ``models/psp.py:37-52``."""
    if encoder_type == "GradualStyleEncoder":
        return GradualStyleEncoder(num_layers, "ir_se", n_styles,
                                   input_nc=input_nc)
    if encoder_type == "BackboneEncoder":
        return BackboneEncoder(50, "ir_se", n_styles, input_nc=input_nc)
    if encoder_type == "BackboneEncoder34":
        return BackboneEncoder(34, "ir_se", n_styles, input_nc=input_nc)
    if encoder_type == "BackboneEncoder100":
        return BackboneEncoder(100, "ir_se", n_styles, input_nc=input_nc)
    if encoder_type == "ResNetBackboneEncoder":
        return ResNetBackboneEncoder(n_styles, input_nc=input_nc)
    if encoder_type == "ProgressiveBackboneEncoder":
        from .e4e import ProgressiveBackboneEncoder
        return ProgressiveBackboneEncoder(50, "ir_se", n_styles,
                                          input_nc=input_nc)
    raise ValueError(f"{encoder_type} is not a valid encoder")


def n_styles_for(output_size: int, generator_ada: bool = True) -> int:
    """``models/psp.py:22-30``: 2*log2(out)-2, +2 for the ADA generator."""
    n = int(math.log2(output_size)) * 2 - 2
    return n + 2 if generator_ada else n


def style_spatial_for(input_size: int) -> int:
    """map2style ``spatial`` arg for an encoder fed ``input_size`` images.

    The IR body downsamples /16, and GradualStyleBlock applies
    ``int(log2(spatial))`` stride-2 convs; the result must be 1x1. The
    vendored fork hardcodes 9 for its 112px pipeline (7x7 maps, 3 convs,
    ``restyle_psp_encoders.py:42``); upstream ReStyle used 16 for 256px.
    """
    fmap = max(1, input_size // 16)
    return 9 if fmap == 7 else 1 << max(1, math.ceil(math.log2(max(2, fmap))))


@dataclasses.dataclass(frozen=True)
class PSp(Layer):
    """Stage-2 ReStyle pSp (``restyle-encoder/models/psp.py:17-119``):
    encoder -> codes (+ residual vs previous latent or latent_avg) ->
    frozen ADA generator -> face_pool to 256.

    apply() inputs: (x, latent) where latent is the carried w from the
    previous refinement iteration or None for iteration 0.
    ``latent_avg`` lives in state (loaded from ckpt / estimated via
    ``Generator.mean_latent``).
    """

    output_size: int = 128
    input_nc: int = 6
    encoder_num_layers: int = 50
    input_size: int = 112            # resolution of the encoder's inputs
    # (the fork's pipeline feeds 112px sources, coach_restyle_psp.py:156;
    # set 256 for upstream-ReStyle-style full-resolution inversion)

    @property
    def n_styles(self):
        return n_styles_for(self.output_size, generator_ada=True)

    def _children(self):
        return {
            "encoder": BackboneEncoder(self.encoder_num_layers, "ir_se",
                                       self.n_styles,
                                       input_nc=self.input_nc,
                                       style_spatial=style_spatial_for(
                                           self.input_size)),
            "decoder": GeneratorAda(z_dim=512, w_dim=512, w_num_layers=8,
                                    img_resolution=self.output_size,
                                    img_channels=3),
        }

    def init(self, key):
        params, state = init_child(self._children(), key)
        state["latent_avg"] = jnp.zeros((self.n_styles, 512))
        return params, state

    def apply(self, params, state, inputs, ctx, resize: bool = True,
              randomize_noise: bool = True, return_latents: bool = False,
              input_code: bool = False):
        x, latent = (inputs if isinstance(inputs, tuple) else (inputs, None))
        ch = self._children()
        new_state = dict(state)
        if input_code:
            codes = x
        else:
            codes, enc_s = ch["encoder"].apply(params["encoder"],
                                               state["encoder"], x, ctx)
            new_state["encoder"] = enc_s
            # residual step (models/psp.py:84-91)
            if latent is not None:
                codes = codes + latent
            else:
                codes = codes + state["latent_avg"][None].astype(codes.dtype)

        noise_mode = "random" if randomize_noise else "const"
        images, dec_s = ch["decoder"].apply(
            params["decoder"], state["decoder"], codes, ctx,
            noise_mode=noise_mode, input_is_latent=True)
        new_state["decoder"] = dec_s

        if resize and images.shape[1] != 256:
            # face_pool AdaptiveAvgPool2d((256,256)) (models/psp.py:33); for
            # the reference's output_size=128 config this UPSAMPLES, where
            # adaptive-avg-pool == nearest-ish duplication only when
            # out % in == 0; we use exact adaptive pooling semantics.
            from ..nn import AdaptiveAvgPool2d
            images, _ = AdaptiveAvgPool2d(256).apply({}, {}, images, ctx)

        if return_latents:
            return (images, codes), new_state
        return images, new_state
