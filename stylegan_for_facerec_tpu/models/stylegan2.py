"""StyleGAN2 (rosinality lineage) generator + discriminator, TPU-native.

Parity target: ``/root/reference/backbone/stylegan2/model.py`` — the CUDA-op
path of the reference (used when ``--generator_ada`` is absent,
``restyle-encoder/models/psp.py:25``) and the architecture family of the
stage-1 GAN. All ``upfirdn2d`` blur/up/down calls route through the fused
XLA op in ops/upfirdn2d.py; ``fused_leaky_relu`` through ops/fused_act.py;
modulated convs use the scaled-activation formulation (ops/modconv.py),
including its transposed-conv (upsample) variant.

Layout: NHWC. Noise buffers and EMA-style statistics are explicit state.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..nn import Ctx, Layer, init_child
from ..ops.fused_act import fused_leaky_relu
from ..ops.modconv import modulated_conv2d
from ..ops.upfirdn2d import make_resample_kernel, upfirdn2d


def pixel_norm(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """``model.py:10-15`` (channel = last axis here)."""
    return x * lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True)
                         + eps)


@dataclasses.dataclass(frozen=True)
class EqualLinear(Layer):
    """``model.py:128-157``: weight N(0,1)/lr_mul (out,in) torch layout,
    runtime scale (1/sqrt(in))*lr_mul, bias*lr_mul; optional fused lrelu."""

    in_dim: int
    out_dim: int
    bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: Optional[str] = None  # None | 'fused_lrelu'

    def init(self, key):
        w = jax.random.normal(key, (self.out_dim, self.in_dim)) / self.lr_mul
        p = {"weight": w}
        if self.bias:
            p["bias"] = jnp.full((self.out_dim,), float(self.bias_init))
        return p, {}

    def apply(self, params, state, x, ctx):
        scale = (1.0 / math.sqrt(self.in_dim)) * self.lr_mul
        w = params["weight"].astype(x.dtype) * scale
        b = (params["bias"].astype(x.dtype) * self.lr_mul
             if self.bias else None)
        if self.activation == "fused_lrelu":
            out = jnp.dot(x, w.T, preferred_element_type=x.dtype)
            out = fused_leaky_relu(out, b)
        else:
            out = jnp.dot(x, w.T, preferred_element_type=x.dtype)
            if b is not None:
                out = out + b
        return out, {}


@dataclasses.dataclass(frozen=True)
class EqualConv2d(Layer):
    """``model.py:90-119``."""

    in_channel: int
    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    bias: bool = True

    def init(self, key):
        k = self.kernel_size
        w = jax.random.normal(key, (k, k, self.in_channel, self.out_channel))
        p = {"weight": w}
        if self.bias:
            p["bias"] = jnp.zeros((self.out_channel,))
        return p, {}

    def apply(self, params, state, x, ctx):
        scale = 1.0 / math.sqrt(self.in_channel * self.kernel_size ** 2)
        w = params["weight"].astype(x.dtype) * scale
        y = lax.conv_general_dilated(
            x, w, (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        if self.bias:
            y = y + params["bias"].astype(x.dtype)
        return y, {}


@dataclasses.dataclass(frozen=True)
class Blur(Layer):
    """``model.py:71-87``."""

    kernel: Sequence[int]
    pad: tuple
    upsample_factor: int = 1

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        k = make_resample_kernel(self.kernel)
        if self.upsample_factor > 1:
            k = k * (self.upsample_factor ** 2)
        return upfirdn2d(x, k, pad=self.pad), {}


@dataclasses.dataclass(frozen=True)
class Upsample(Layer):
    """``model.py:29-47``."""

    kernel: Sequence[int] = (1, 3, 3, 1)
    factor: int = 2

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        k = make_resample_kernel(self.kernel) * (self.factor ** 2)
        p = k.shape[0] - self.factor
        pad0 = (p + 1) // 2 + self.factor - 1
        pad1 = p // 2
        return upfirdn2d(x, k, up=self.factor, pad=(pad0, pad1)), {}


@dataclasses.dataclass(frozen=True)
class Downsample(Layer):
    """``model.py:50-68``."""

    kernel: Sequence[int] = (1, 3, 3, 1)
    factor: int = 2

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        k = make_resample_kernel(self.kernel)
        p = k.shape[0] - self.factor
        pad0 = (p + 1) // 2
        pad1 = p // 2
        return upfirdn2d(x, k, down=self.factor, pad=(pad0, pad1)), {}


def _mod_demod(weight_hwio, styles, scale, demodulate, eps=1e-8):
    """Per-sample demod coefficients for the shared-weight formulation:
    dcoef[b,o] = rsqrt(sum_ik (scale*W[k,i,o]*style[b,i])^2 + eps)."""
    w_sq = jnp.sum(jnp.square(weight_hwio.astype(jnp.float32))
                   * scale * scale, axis=(0, 1))          # (I, O)
    denom = jnp.square(styles.astype(jnp.float32)) @ w_sq + eps
    return lax.rsqrt(denom)


@dataclasses.dataclass(frozen=True)
class ModulatedConv2d(Layer):
    """``model.py:177-273`` with the grouped-conv replaced by the
    scale-activations trick; the upsample branch becomes a shared-weight
    transposed conv (lhs_dilation) + blur, the downsample branch
    blur + strided conv."""

    in_channel: int
    out_channel: int
    kernel_size: int
    style_dim: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    def _children(self):
        return {"modulation": EqualLinear(self.style_dim, self.in_channel,
                                          bias_init=1.0)}

    def init(self, key):
        km, kw = jax.random.split(key)
        params, _ = init_child(self._children(), km)
        k = self.kernel_size
        params["weight"] = jax.random.normal(
            kw, (k, k, self.in_channel, self.out_channel))
        return params, {}

    def apply(self, params, state, inputs, ctx):
        x, style = inputs
        k = self.kernel_size
        scale = 1.0 / math.sqrt(self.in_channel * k ** 2)
        styles, _ = self._children()["modulation"].apply(
            params["modulation"], {}, style, ctx)
        w = params["weight"].astype(x.dtype)

        x_mod = x * styles[:, None, None, :].astype(x.dtype)

        if self.upsample:
            # conv_transpose(stride 2, pad 0) == conv with lhs_dilation=2 and
            # full (k-1) padding of the spatially-flipped kernel
            y = lax.conv_general_dilated(
                x_mod, (w * scale)[::-1, ::-1], (1, 1),
                [(k - 1, k - 1)] * 2, lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=x.dtype)
            if self.demodulate:
                d = _mod_demod(w, styles, scale, True).astype(y.dtype)
                y = y * d[:, None, None, :]
            p = (len(self.blur_kernel) - 2) - (k - 1)
            blur = Blur(tuple(self.blur_kernel),
                        ((p + 1) // 2 + 1, p // 2 + 1), upsample_factor=2)
            y, _ = blur.apply({}, {}, y, ctx)
            return y, {}

        if self.downsample:
            p = (len(self.blur_kernel) - 2) + (k - 1)
            blur = Blur(tuple(self.blur_kernel), ((p + 1) // 2, p // 2))
            x_mod, _ = blur.apply({}, {}, x_mod, ctx)
            y = lax.conv_general_dilated(
                x_mod, w * scale, (2, 2), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=x.dtype)
            if self.demodulate:
                d = _mod_demod(w, styles, scale, True).astype(y.dtype)
                y = y * d[:, None, None, :]
            return y, {}

        y = lax.conv_general_dilated(
            x_mod, w * scale, (1, 1), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        if self.demodulate:
            d = _mod_demod(w, styles, scale, True).astype(y.dtype)
            y = y * d[:, None, None, :]
        return y, {}


@dataclasses.dataclass(frozen=True)
class NoiseInjection(Layer):
    """``model.py:276-287``: scalar-weighted additive noise."""

    def init(self, key):
        return {"weight": jnp.zeros((1,))}, {}

    def apply(self, params, state, inputs, ctx):
        image, noise = inputs
        if noise is None:
            n, h, w, _ = image.shape
            noise = jax.random.normal(ctx.make_rng(), (n, h, w, 1),
                                      image.dtype)
        return image + params["weight"].astype(image.dtype) * noise, {}


@dataclasses.dataclass(frozen=True)
class StyledConv(Layer):
    """``model.py:303-337``: mod-conv -> noise -> FusedLeakyReLU(bias)."""

    in_channel: int
    out_channel: int
    kernel_size: int
    style_dim: int
    upsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    demodulate: bool = True

    def _children(self):
        return {
            "conv": ModulatedConv2d(self.in_channel, self.out_channel,
                                    self.kernel_size, self.style_dim,
                                    demodulate=self.demodulate,
                                    upsample=self.upsample,
                                    blur_kernel=self.blur_kernel),
            "noise": NoiseInjection(),
        }

    def init(self, key):
        kc, kn, kb = jax.random.split(key, 3)
        params, state = init_child(self._children(), kc)
        # FusedLeakyReLU module owns the per-channel bias (op/fused_act.py:72-81)
        params["activate"] = {"bias": jnp.zeros((self.out_channel,))}
        return params, state

    def apply(self, params, state, inputs, ctx, noise=None):
        x, style = inputs
        ch = self._children()
        y, _ = ch["conv"].apply(params["conv"], {}, (x, style), ctx)
        y, _ = ch["noise"].apply(params["noise"], {}, (y, noise), ctx)
        y = fused_leaky_relu(y, params["activate"]["bias"])
        return y, {}


@dataclasses.dataclass(frozen=True)
class ToRGB(Layer):
    """``model.py:340-359``."""

    in_channel: int
    style_dim: int
    upsample: bool = True
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    def _children(self):
        return {"conv": ModulatedConv2d(self.in_channel, 3, 1,
                                        self.style_dim, demodulate=False)}

    def init(self, key):
        params, state = init_child(self._children(), key)
        params["bias"] = jnp.zeros((3,))
        return params, state

    def apply(self, params, state, inputs, ctx, skip=None):
        x, style = inputs
        y, _ = self._children()["conv"].apply(params["conv"], {}, (x, style),
                                              ctx)
        y = y + params["bias"].astype(y.dtype)
        if skip is not None:
            up = Upsample(tuple(self.blur_kernel))
            skip, _ = up.apply({}, {}, skip, ctx)
            y = y + skip
        return y, {}


def _channels(channel_multiplier: int):
    """``model.py:389-399``."""
    return {4: 512, 8: 512, 16: 512, 32: 512,
            64: 256 * channel_multiplier, 128: 128 * channel_multiplier,
            256: 64 * channel_multiplier, 512: 32 * channel_multiplier,
            1024: 16 * channel_multiplier}


@dataclasses.dataclass(frozen=True)
class Generator(Layer):
    """``model.py:362-542``. apply() takes a list of style vectors (z's or
    w's); supports style mixing (inject_index), truncation toward a given
    latent, and const/random noise via state buffers / Ctx rng."""

    size: int = 256
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01

    @property
    def log_size(self):
        return int(math.log2(self.size))

    @property
    def num_layers(self):
        return (self.log_size - 2) * 2 + 1

    @property
    def n_latent(self):
        return self.log_size * 2 - 2

    def _children(self):
        ch = _channels(self.channel_multiplier)
        d = {}
        for i in range(self.n_mlp):
            # torch: style.0 is PixelNorm, linears at style.1..n_mlp
            d[f"style.{i + 1}"] = EqualLinear(
                self.style_dim, self.style_dim, lr_mul=self.lr_mlp,
                activation="fused_lrelu")
        d["conv1"] = StyledConv(ch[4], ch[4], 3, self.style_dim,
                                blur_kernel=self.blur_kernel)
        d["to_rgb1"] = ToRGB(ch[4], self.style_dim, upsample=False)
        in_ch = ch[4]
        ci = 0
        for i in range(3, self.log_size + 1):
            out_ch = ch[2 ** i]
            d[f"convs.{ci}"] = StyledConv(in_ch, out_ch, 3, self.style_dim,
                                          upsample=True,
                                          blur_kernel=self.blur_kernel)
            d[f"convs.{ci + 1}"] = StyledConv(out_ch, out_ch, 3,
                                              self.style_dim,
                                              blur_kernel=self.blur_kernel)
            d[f"to_rgbs.{(i - 3)}"] = ToRGB(out_ch, self.style_dim)
            in_ch = out_ch
            ci += 2
        return d

    def init(self, key):
        kc, ki, kn = jax.random.split(key, 3)
        params, state = init_child(self._children(), kc)
        ch = _channels(self.channel_multiplier)
        params["input"] = {"input": jax.random.normal(ki, (1, 4, 4, ch[4]))}
        noises = {}
        nkeys = jax.random.split(kn, self.num_layers)
        for li in range(self.num_layers):
            res = 2 ** ((li + 5) // 2)
            noises[f"noise_{li}"] = jax.random.normal(nkeys[li],
                                                      (1, res, res, 1))
        state["noises"] = noises
        return params, state

    def style_mlp(self, params, z, ctx):
        x = pixel_norm(z)
        ch = self._children()
        for i in range(self.n_mlp):
            name = f"style.{i + 1}"
            x, _ = ch[name].apply(params[name], {}, x, ctx)
        return x

    def mean_latent(self, params, key, n_latent: int):
        """``model.py:459-465``."""
        z = jax.random.normal(key, (n_latent, self.style_dim))
        w = self.style_mlp(params, z, Ctx(train=False))
        return jnp.mean(w, axis=0, keepdims=True)

    def apply(self, params, state, styles, ctx,
              input_is_latent: bool = False, inject_index: Optional[int]
              = None, truncation: float = 1.0, truncation_latent=None,
              noise: Optional[List] = None, randomize_noise: bool = True,
              return_latents: bool = False):
        if not isinstance(styles, (list, tuple)):
            styles = [styles]
        ch = self._children()
        if not input_is_latent:
            styles = [self.style_mlp(params, s, ctx) for s in styles]

        if noise is None:
            if randomize_noise:
                noise = [None] * self.num_layers
            else:
                noise = [state["noises"][f"noise_{i}"]
                         for i in range(self.num_layers)]

        if truncation < 1:
            styles = [truncation_latent
                      + truncation * (s - truncation_latent) for s in styles]

        if len(styles) < 2:
            if styles[0].ndim < 3:
                latent = jnp.repeat(styles[0][:, None], self.n_latent, axis=1)
            else:
                latent = styles[0]
        else:
            if inject_index is not None:
                idx = inject_index
            elif getattr(ctx, "_key", None) is not None:
                # per-call random crossover (model.py:512-513
                # random.randint(1, n_latent-1)); traced idx + where keeps
                # shapes static under jit
                idx = jax.random.randint(ctx.make_rng(), (), 1,
                                         self.n_latent)
            else:
                idx = self.n_latent // 2
            pos = jnp.arange(self.n_latent)[None, :, None]
            latent = jnp.where(pos < idx, styles[0][:, None, :],
                               styles[1][:, None, :])

        n = latent.shape[0]
        out = jnp.tile(params["input"]["input"].astype(latent.dtype),
                       (n, 1, 1, 1))
        out, _ = ch["conv1"].apply(params["conv1"], {},
                                   (out, latent[:, 0]), ctx, noise=noise[0])
        skip, _ = ch["to_rgb1"].apply(params["to_rgb1"], {},
                                      (out, latent[:, 1]), ctx)

        i = 1
        n_up = self.log_size - 2
        for b in range(n_up):
            out, _ = ch[f"convs.{2 * b}"].apply(
                params[f"convs.{2 * b}"], {}, (out, latent[:, i]), ctx,
                noise=noise[1 + 2 * b])
            out, _ = ch[f"convs.{2 * b + 1}"].apply(
                params[f"convs.{2 * b + 1}"], {}, (out, latent[:, i + 1]),
                ctx, noise=noise[2 + 2 * b])
            skip, _ = ch[f"to_rgbs.{b}"].apply(
                params[f"to_rgbs.{b}"], {}, (out, latent[:, i + 2]), ctx,
                skip=skip)
            i += 2
            if ctx.shard_fn is not None:
                # spatial sharding hook (parallel/spatial.py): pin each
                # resolution's activations so GSPMD halo-exchanges the
                # convs instead of replicating the growing image
                out, skip = ctx.shard_fn(out), ctx.shard_fn(skip)

        if return_latents:
            return (skip, latent), dict(state)
        return skip, dict(state)


# ---------------------------------------------------------------------------
# Discriminator
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ConvLayer(Layer):
    """``model.py:545-591``: optional blur+stride-2 downsample, equalized
    conv, fused lrelu."""

    in_channel: int
    out_channel: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    bias: bool = True
    activate: bool = True

    def _children(self):
        d = {}
        idx = 0
        if self.downsample:
            p = (len(self.blur_kernel) - 2) + (self.kernel_size - 1)
            d[str(idx)] = Blur(tuple(self.blur_kernel),
                               ((p + 1) // 2, p // 2))
            idx += 1
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel_size // 2
        d[str(idx)] = EqualConv2d(self.in_channel, self.out_channel,
                                  self.kernel_size, stride=stride,
                                  padding=padding,
                                  bias=self.bias and not self.activate)
        return d

    def init(self, key):
        params, state = init_child(self._children(), key)
        if self.activate and self.bias:
            # FusedLeakyReLU bias module sits after the conv in torch naming
            act_idx = 2 if self.downsample else 1
            params[str(act_idx)] = {"bias": jnp.zeros((self.out_channel,))}
        return params, state

    def apply(self, params, state, x, ctx):
        ch = self._children()
        for name in sorted(ch, key=int):
            x, _ = ch[name].apply(params.get(name, {}), {}, x, ctx)
        if self.activate:
            if self.bias:
                act_idx = 2 if self.downsample else 1
                x = fused_leaky_relu(x, params[str(act_idx)]["bias"])
            else:
                x = jnp.where(x >= 0, x, 0.2 * x) * math.sqrt(2)
        return x, {}


@dataclasses.dataclass(frozen=True)
class ResBlock(Layer):
    """``model.py:594-612``."""

    in_channel: int
    out_channel: int
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    def _children(self):
        return {
            "conv1": ConvLayer(self.in_channel, self.in_channel, 3),
            "conv2": ConvLayer(self.in_channel, self.out_channel, 3,
                               downsample=True),
            "skip": ConvLayer(self.in_channel, self.out_channel, 1,
                              downsample=True, activate=False, bias=False),
        }

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        out, _ = ch["conv1"].apply(params["conv1"], {}, x, ctx)
        out, _ = ch["conv2"].apply(params["conv2"], {}, out, ctx)
        skip, _ = ch["skip"].apply(params["skip"], {}, x, ctx)
        return (out + skip) / math.sqrt(2), {}


@dataclasses.dataclass(frozen=True)
class Discriminator(Layer):
    """``model.py:615-673`` incl. minibatch-stddev feature."""

    size: int = 256
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    stddev_group: int = 4
    stddev_feat: int = 1

    def _children(self):
        ch = _channels(self.channel_multiplier)
        log_size = int(math.log2(self.size))
        d = {"convs.0": ConvLayer(3, ch[self.size], 1)}
        in_ch = ch[self.size]
        idx = 1
        for i in range(log_size, 2, -1):
            out_ch = ch[2 ** (i - 1)]
            d[f"convs.{idx}"] = ResBlock(in_ch, out_ch,
                                         tuple(self.blur_kernel))
            in_ch = out_ch
            idx += 1
        d["final_conv"] = ConvLayer(in_ch + 1, ch[4], 3)
        d["final_linear.0"] = EqualLinear(ch[4] * 4 * 4, ch[4],
                                          activation="fused_lrelu")
        d["final_linear.1"] = EqualLinear(ch[4], 1)
        return d

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        log_size = int(math.log2(self.size))
        n_blocks = log_size - 2
        for idx in range(n_blocks + 1):
            name = f"convs.{idx}"
            x, _ = ch[name].apply(params[name], {}, x, ctx)

        # minibatch stddev (model.py:658-666), NHWC
        n, h, w, c = x.shape
        group = min(n, self.stddev_group)
        f = self.stddev_feat
        y = x.reshape(group, -1, h, w, f, c // f)
        var = jnp.var(y, axis=0)
        stddev = jnp.sqrt(var + 1e-8)
        stddev = jnp.mean(stddev, axis=(1, 2, 4), keepdims=True)
        stddev = stddev.squeeze(4)                    # (n/group, 1, 1, 1)
        stddev = jnp.tile(stddev, (group, h, w, 1))
        x = jnp.concatenate([x, stddev], axis=-1)

        x, _ = ch["final_conv"].apply(params["final_conv"], {}, x, ctx)
        # torch flattens NCHW (C,H,W)-major; match it for weight parity
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)
        x, _ = ch["final_linear.0"].apply(params["final_linear.0"], {}, x,
                                          ctx)
        x, _ = ch["final_linear.1"].apply(params["final_linear.1"], {}, x,
                                          ctx)
        return x, {}
