"""StyleGAN2-ADA generator, TPU-native.

Parity target: ``/root/reference/backbone/stylegan2_ada/generator.py`` and
``.../utils.py`` (the generator actually used by the pipeline via
``--generator_ada``, ``restyle-encoder/models/psp.py:24-30``).

TPU-first redesign notes:
  * ``modulated_conv2d`` runs in the scaled-activation formulation
    (ops/modconv.py) — one shared-weight MXU conv instead of the
    reference's groups=batch trick (``utils.py:120-137``).
  * ``SmoothUpsample``/``SmoothDownsample`` are separable 1-D FIR passes
    (ops/resample.py).
  * The mapping network's ``w_avg`` EMA — an in-place buffer mutation inside
    torch forward (``generator.py:275-276``), racy under replication — is
    explicit carried state here.
  * Per-layer noise: 'random' threads the Ctx PRNG; 'const' uses the stored
    buffer (kept in state for checkpoint parity; never updated).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import Ctx, InstanceNorm2d, Layer, init_child
from ..ops.fused_act import bias_act, clamp_gain
from ..ops.modconv import modulated_conv2d
from ..ops.resample import smooth_downsample, smooth_upsample


def normalize_2nd_moment(x: jax.Array, axis: int = -1,
                         eps: float = 1e-8) -> jax.Array:
    """``utils.py:10-11``."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis,
                                      keepdims=True) + eps)


@dataclasses.dataclass(frozen=True)
class FullyConnectedLayer(Layer):
    """Equalized-LR dense layer (``utils.py:34-51``): weight stored as
    N(0,1)/lr_mul, runtime gain lr_mul/sqrt(in); optional lrelu with
    sqrt(2) gain. Weight layout (out, in) = torch, for converter parity."""

    in_features: int
    out_features: int
    bias: bool = True
    activation: str = "linear"   # 'linear' | 'lrelu'
    lr_multiplier: float = 1.0
    bias_init: float = 0.0

    def init(self, key):
        w = jax.random.normal(key, (self.out_features, self.in_features))
        w = w / self.lr_multiplier
        p = {"weight": w}
        if self.bias:
            p["bias"] = jnp.full((self.out_features,), float(self.bias_init))
        return p, {}

    def apply(self, params, state, x, ctx):
        gain = self.lr_multiplier / math.sqrt(self.in_features)
        w = params["weight"].astype(x.dtype) * gain
        y = jnp.dot(x, w.T, preferred_element_type=x.dtype)
        if self.bias:
            b = params["bias"].astype(x.dtype)
            if self.lr_multiplier != 1.0:
                b = b * self.lr_multiplier
            y = y + b
        if self.activation == "lrelu":
            y = jnp.where(y >= 0, y, 0.2 * y) * math.sqrt(2)
        return y, {}


@dataclasses.dataclass(frozen=True)
class EqualizedConv2d(Layer):
    """``utils.py:98-117``: runtime 1/sqrt(fan-in) gain, optional resample,
    act + clamp_gain(act_gain*gain, 256*gain). Used by the discriminator."""

    in_channels: int
    out_channels: int
    kernel_size: int
    bias: bool = True
    activation: str = "linear"
    resample: str = "none"       # 'none' | 'up' | 'down'

    def init(self, key):
        k = self.kernel_size
        w = jax.random.normal(key, (k, k, self.in_channels,
                                    self.out_channels))
        p = {"weight": w}
        if self.bias:
            p["bias"] = jnp.zeros((self.out_channels,))
        return p, {}

    def apply(self, params, state, x, ctx, gain: float = 1.0):
        wg = 1.0 / math.sqrt(self.in_channels * self.kernel_size ** 2)
        w = params["weight"].astype(x.dtype) * wg
        if self.resample == "up":
            x = smooth_upsample(x)
        elif self.resample == "down":
            x = smooth_downsample(x)
        pad = self.kernel_size // 2
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        b = params["bias"].astype(x.dtype) if self.bias else 0.0
        act_gain = math.sqrt(2) if self.activation == "lrelu" else 1.0
        y = y + b
        if self.activation == "lrelu":
            y = jnp.where(y >= 0, y, 0.2 * y)
        return clamp_gain(y, act_gain * gain, 256 * gain), {}


@dataclasses.dataclass(frozen=True)
class MappingNetwork(Layer):
    """z -> w (``generator.py:245-289``): 2nd-moment normalize, 8 equalized
    FCs (lrelu, lr_mul 0.01), w_avg EMA in train mode, broadcast to num_ws,
    truncation lerp toward w_avg."""

    z_dim: int = 512
    w_dim: int = 512
    num_ws: Optional[int] = 18
    num_layers: int = 8
    lr_multiplier: float = 0.01
    w_avg_beta: Optional[float] = 0.995

    def _children(self):
        feats = [self.z_dim] + [self.w_dim] * self.num_layers
        return {f"layers.{i}": FullyConnectedLayer(
            feats[i], feats[i + 1], activation="lrelu",
            lr_multiplier=self.lr_multiplier)
            for i in range(self.num_layers)}

    def init(self, key):
        params, _ = init_child(self._children(), key)
        state = {}
        if self.num_ws is not None and self.w_avg_beta is not None:
            state["w_avg"] = jnp.zeros((self.w_dim,))
        return params, state

    def apply(self, params, state, z, ctx, truncation_psi: float = 1.0,
              truncation_cutoff: Optional[int] = None,
              skip_w_avg_update: bool = False):
        ch = self._children()
        x = normalize_2nd_moment(z)
        for i in range(self.num_layers):
            x, _ = ch[f"layers.{i}"].apply(params[f"layers.{i}"], {}, x, ctx)

        new_state = dict(state)
        if (self.w_avg_beta is not None and ctx.train
                and not skip_w_avg_update and "w_avg" in state):
            # lerp(mean, w_avg, beta) = (1-beta)*mean + beta*w_avg
            mean = jax.lax.stop_gradient(jnp.mean(x, axis=0))
            new_state["w_avg"] = (mean + self.w_avg_beta
                                  * (state["w_avg"] - mean))

        if self.num_ws is not None:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)

        if truncation_psi != 1.0:
            if "w_avg" not in state:
                # the reference raises on the missing buffer
                # (generator.py:284-288); silently lerping toward zeros
                # would shrink outputs toward a meaningless origin
                raise ValueError(
                    "truncation_psi != 1 requires a tracked w_avg "
                    "(construct the mapping network with w_avg_beta)")
            w_avg = state["w_avg"].astype(x.dtype)
            trunc = w_avg + truncation_psi * (x - w_avg)
            if self.num_ws is not None and truncation_cutoff is not None:
                x = x.at[:, :truncation_cutoff].set(
                    trunc[:, :truncation_cutoff])
            else:
                x = trunc
        return x, new_state


@dataclasses.dataclass(frozen=True)
class SynthesisLayer(Layer):
    """StyleGAN2 synthesis conv (``generator.py:175-205``, SynthesisLayer2):
    affine styles -> modulated conv (pad k//2) -> optional SmoothUpsample ->
    + noise -> bias -> lrelu -> clamp_gain."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: bool = False

    def _children(self):
        return {"affine": FullyConnectedLayer(self.w_dim, self.in_channels,
                                              bias_init=1.0)}

    def init(self, key):
        ka, kw, kn = jax.random.split(key, 3)
        params, _ = init_child(self._children(), ka)
        params["weight"] = jax.random.normal(
            kw, (self.kernel_size, self.kernel_size, self.in_channels,
                 self.out_channels))
        params["noise_strength"] = jnp.zeros((1,))
        params["bias"] = jnp.zeros((self.out_channels,))
        state = {"noise_const": jax.random.normal(
            kn, (self.resolution, self.resolution))}
        return params, state

    def apply(self, params, state, inputs, ctx, noise_mode: str = "random",
              gain: float = 1.0):
        x, w = inputs
        styles, _ = self._children()["affine"].apply(params["affine"], {}, w,
                                                     ctx)
        # int8 serving hook (utils/quantize.py): the scaled-activation
        # modconv has a static base weight, so it quantizes like a conv
        quant = getattr(ctx.quant, "modconv", None) if ctx.quant else None
        if quant is not None:
            x = quant(params, x, styles, padding=self.kernel_size // 2,
                      demodulate=True)
        else:
            x = modulated_conv2d(x, params["weight"].astype(x.dtype),
                                 styles, padding=self.kernel_size // 2,
                                 demodulate=True)
        if self.up:
            x = smooth_upsample(x)

        ns = params["noise_strength"].astype(x.dtype)
        if noise_mode == "random":
            noise = jax.random.normal(
                ctx.make_rng(), (x.shape[0], self.resolution,
                                 self.resolution, 1), x.dtype) * ns
            x = x + noise
        elif noise_mode == "const":
            x = x + state["noise_const"].astype(x.dtype)[None, :, :, None] * ns
        # 'none': skip

        x = bias_act(x, params["bias"], act="lrelu", gain=gain, clamp=256.0)
        return x, dict(state)


@dataclasses.dataclass(frozen=True)
class ToRGBLayer(Layer):
    """``generator.py:145-157`` (ToRGBLayer2): styles scaled by
    1/sqrt(in*k^2), non-demodulated 1x1 mod-conv, bias, clamp ±256."""

    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1

    def _children(self):
        return {"affine": FullyConnectedLayer(self.w_dim, self.in_channels,
                                              bias_init=1.0)}

    def init(self, key):
        ka, kw = jax.random.split(key)
        params, _ = init_child(self._children(), ka)
        params["weight"] = jax.random.normal(
            kw, (self.kernel_size, self.kernel_size, self.in_channels,
                 self.out_channels))
        params["bias"] = jnp.zeros((self.out_channels,))
        return params, {}

    def apply(self, params, state, inputs, ctx):
        x, w = inputs
        styles, _ = self._children()["affine"].apply(params["affine"], {}, w,
                                                     ctx)
        wg = 1.0 / math.sqrt(self.in_channels * self.kernel_size ** 2)
        quant = getattr(ctx.quant, "modconv", None) if ctx.quant else None
        if quant is not None:
            x = quant(params, x, styles * wg, padding=0, demodulate=False)
        else:
            x = modulated_conv2d(x, params["weight"].astype(x.dtype),
                                 styles * wg, demodulate=False)
        return jnp.clip(x + params["bias"].astype(x.dtype), -256, 256), {}


@dataclasses.dataclass(frozen=True)
class SynthesisPrologue(Layer):
    """``generator.py:94-112``: learned const input -> conv1 -> torgb.
    ``synthesis_layer`` picks the StyleGAN2 or StyleGAN1 layer family
    (``generator.py:98-99``)."""

    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    synthesis_layer: str = "stylegan2"

    def _children(self):
        sl = SynthesisLayer if self.synthesis_layer == "stylegan2" \
            else SynthesisLayer1
        trgb = ToRGBLayer if self.synthesis_layer == "stylegan2" \
            else ToRGBLayer1
        return {
            "conv1": sl(self.out_channels, self.out_channels,
                        self.w_dim, self.resolution),
            "torgb": trgb(self.out_channels, self.img_channels,
                          self.w_dim),
        }

    def init(self, key):
        kc, kch = jax.random.split(key)
        params, state = init_child(self._children(), kch)
        params["const"] = jax.random.normal(
            kc, (self.resolution, self.resolution, self.out_channels))
        return params, state

    def apply(self, params, state, ws, ctx, noise_mode="random"):
        ch = self._children()
        n = ws.shape[0]
        x = jnp.broadcast_to(params["const"][None],
                             (n,) + params["const"].shape).astype(ws.dtype)
        x, s1 = ch["conv1"].apply(params["conv1"], state["conv1"],
                                  (x, ws[:, 0]), ctx, noise_mode=noise_mode)
        img, _ = ch["torgb"].apply(params["torgb"], {}, (x, ws[:, 1]), ctx)
        return (x, img), {"conv1": s1}


@dataclasses.dataclass(frozen=True)
class SynthesisBlock(Layer):
    """``generator.py:115-142``: conv0 (up) -> conv1 -> torgb; skip image
    upsampled and summed."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    synthesis_layer: str = "stylegan2"

    def _children(self):
        sl = SynthesisLayer if self.synthesis_layer == "stylegan2" \
            else SynthesisLayer1
        trgb = ToRGBLayer if self.synthesis_layer == "stylegan2" \
            else ToRGBLayer1
        return {
            "conv0": sl(self.in_channels, self.out_channels,
                        self.w_dim, self.resolution, up=True),
            "conv1": sl(self.out_channels, self.out_channels,
                        self.w_dim, self.resolution),
            "torgb": trgb(self.out_channels, self.img_channels,
                          self.w_dim),
        }

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, inputs, ctx, noise_mode="random"):
        ch = self._children()
        x, img, ws = inputs
        x, s0 = ch["conv0"].apply(params["conv0"], state["conv0"],
                                  (x, ws[:, 0]), ctx, noise_mode=noise_mode)
        x, s1 = ch["conv1"].apply(params["conv1"], state["conv1"],
                                  (x, ws[:, 1]), ctx, noise_mode=noise_mode)
        y, _ = ch["torgb"].apply(params["torgb"], {}, (x, ws[:, 2]), ctx)
        img = smooth_upsample(img) + y
        return (x, img), {"conv0": s0, "conv1": s1}


def channels_for(resolutions, channel_base=16384, channel_max=512):
    """``generator.py:71``."""
    return {res: min(channel_base // res, channel_max) for res in resolutions}


@dataclasses.dataclass(frozen=True)
class SynthesisNetwork(Layer):
    """``generator.py:60-91``: progressive block pyramid 4 -> img_resolution;
    ws split as [0:2] then [2n+1 : 2n+4] per block (``generator.py:83``)."""

    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 16384
    channel_max: int = 512
    synthesis_layer: str = "stylegan2"

    @property
    def block_resolutions(self):
        return [2 ** i for i in
                range(2, int(math.log2(self.img_resolution)) + 1)]

    @property
    def num_ws(self):
        return 2 * (len(self.block_resolutions) + 1)

    def _children(self):
        res = self.block_resolutions
        chans = channels_for(res, self.channel_base, self.channel_max)
        d = {"first_block": SynthesisPrologue(
            chans[res[0]], self.w_dim, res[0], self.img_channels,
            synthesis_layer=self.synthesis_layer)}
        for i, r in enumerate(res[1:]):
            d[f"blocks.{i}"] = SynthesisBlock(
                chans[r // 2], chans[r], self.w_dim, r, self.img_channels,
                synthesis_layer=self.synthesis_layer)
        return d

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, ws, ctx, noise_mode="random"):
        ch = self._children()
        nblocks = len(self.block_resolutions)
        split_ws = [ws[:, 0:2]] + [ws[:, 2 * n + 1: 2 * n + 4]
                                   for n in range(nblocks)]
        (x, img), s = ch["first_block"].apply(
            params["first_block"], state["first_block"], split_ws[0], ctx,
            noise_mode=noise_mode)
        new_state = {"first_block": s}
        if ctx.shard_fn is not None:
            # pin each block's activations to the requested (spatial)
            # sharding so GSPMD partitions the convs with halo exchanges
            # rather than replicating the growing image (parallel/spatial)
            x, img = ctx.shard_fn(x), ctx.shard_fn(img)
        for i in range(nblocks - 1):
            name = f"blocks.{i}"
            (x, img), s = ch[name].apply(params[name], state[name],
                                         (x, img, split_ws[i + 1]), ctx,
                                         noise_mode=noise_mode)
            new_state[name] = s
            if ctx.shard_fn is not None:
                x, img = ctx.shard_fn(x), ctx.shard_fn(img)
        return img, new_state


@dataclasses.dataclass(frozen=True)
class Generator(Layer):
    """``generator.py:6-57``. apply() consumes z (or w when
    ``input_is_latent``) and returns the synthesized image."""

    z_dim: int = 512
    w_dim: int = 512
    w_num_layers: int = 8
    img_resolution: int = 256
    img_channels: int = 3
    synthesis_layer: str = "stylegan2"

    def _children(self):
        synth = SynthesisNetwork(self.w_dim, self.img_resolution,
                                 self.img_channels,
                                 synthesis_layer=self.synthesis_layer)
        return {
            "synthesis": synth,
            "mapping": MappingNetwork(self.z_dim, self.w_dim,
                                      num_ws=synth.num_ws,
                                      num_layers=self.w_num_layers),
        }

    @property
    def num_ws(self):
        return self._children()["synthesis"].num_ws

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, z, ctx, truncation_psi: float = 1.0,
              truncation_cutoff: Optional[int] = None,
              noise_mode: str = "random", input_is_latent: bool = False):
        ch = self._children()
        new_state = dict(state)
        if input_is_latent:
            ws = z
        else:
            ws, ms = ch["mapping"].apply(
                params["mapping"], state["mapping"], z, ctx,
                truncation_psi=truncation_psi,
                truncation_cutoff=truncation_cutoff)
            new_state["mapping"] = ms
        img, ss = ch["synthesis"].apply(params["synthesis"],
                                        state["synthesis"], ws, ctx,
                                        noise_mode=noise_mode)
        new_state["synthesis"] = ss
        return img, new_state

    def mean_latent(self, params, state, key, n_latent: int,
                    batch: int = 8192):
        """``generator.py:48-57``: average mapped w over n_latent random z;
        returns (num_ws, w_dim) as the stage-2 coach consumes it
        (``coach_restyle_psp.py:46-47`` takes ``mean_latent(1e5)[0]``)."""
        ch = self._children()
        total = jnp.zeros((self.w_dim,), jnp.float32)
        done = 0
        map_fn = jax.jit(lambda z: ch["mapping"].apply(
            params["mapping"], state["mapping"], z, Ctx(train=False))[0])
        while done < n_latent:
            b = min(batch, n_latent - done)
            key, sub = jax.random.split(key)
            z = jax.random.normal(sub, (b, self.z_dim))
            w = map_fn(z)  # (b, num_ws, w_dim); rows identical pre-truncation
            total = total + jnp.sum(w[:, 0, :], axis=0)
            done += b
        return jnp.tile((total / n_latent)[None, :], (self.num_ws, 1))


# ---------------------------------------------------------------------------
# StyleGAN1 variants (kept for parity with generator.py:160-242, 292-305)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AdaIN(Layer):
    """``generator.py:292-305``: instance-norm + style-chunked gamma/beta."""

    in_channels: int

    def init(self, key):
        return {}, {}

    def apply(self, params, state, inputs, ctx):
        x, style = inputs
        norm, _ = InstanceNorm2d(self.in_channels).apply({}, {}, x, ctx)
        gamma, beta = jnp.split(style, 2, axis=-1)
        return gamma[:, None, None, :] * norm + beta[:, None, None, :], {}


@dataclasses.dataclass(frozen=True)
class SynthesisLayer1(Layer):
    """StyleGAN1 synthesis conv (``generator.py:208-242``): plain
    equalized conv -> resample -> noise -> bias/lrelu/clamp -> AdaIN with
    affine(w) -> (gamma, beta)."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: bool = False

    def _children(self):
        return {"affine": FullyConnectedLayer(self.w_dim,
                                              self.out_channels * 2,
                                              bias_init=1.0),
                "ada_in": AdaIN(self.out_channels)}

    def init(self, key):
        ka, kw, kn = jax.random.split(key, 3)
        params, _ = init_child(self._children(), ka)
        params["weight"] = jax.random.normal(
            kw, (self.kernel_size, self.kernel_size, self.in_channels,
                 self.out_channels))
        params["noise_strength"] = jnp.zeros((1,))
        params["bias"] = jnp.zeros((self.out_channels,))
        state = {"noise_const": jax.random.normal(
            kn, (self.resolution, self.resolution))}
        return params, state

    def apply(self, params, state, inputs, ctx, noise_mode="random",
              gain: float = 1.0):
        x, w = inputs
        ch = self._children()
        styles, _ = ch["affine"].apply(params["affine"], {}, w, ctx)
        wg = 1.0 / math.sqrt(self.in_channels * self.kernel_size ** 2)
        wk = params["weight"].astype(x.dtype) * wg
        pad = self.kernel_size // 2
        x = jax.lax.conv_general_dilated(
            x, wk, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        if self.up:
            x = smooth_upsample(x)
        ns = params["noise_strength"].astype(x.dtype)
        if noise_mode == "random":
            x = x + jax.random.normal(
                ctx.make_rng(), (x.shape[0], self.resolution,
                                 self.resolution, 1), x.dtype) * ns
        elif noise_mode == "const":
            x = x + state["noise_const"].astype(x.dtype)[None, :, :, None] \
                * ns
        x = bias_act(x, params["bias"], act="lrelu", gain=gain, clamp=256.0)
        x, _ = ch["ada_in"].apply({}, {}, (x, styles), ctx)
        return x, dict(state)


@dataclasses.dataclass(frozen=True)
class ToRGBLayer1(Layer):
    """``generator.py:160-172``: style-free equalized 1x1 conv + clamp."""

    in_channels: int
    out_channels: int
    w_dim: int = 512
    kernel_size: int = 1

    def init(self, key):
        params = {"weight": jax.random.normal(
            key, (self.kernel_size, self.kernel_size, self.in_channels,
                  self.out_channels)),
            "bias": jnp.zeros((self.out_channels,))}
        return params, {}

    def apply(self, params, state, inputs, ctx):
        x, _w = inputs
        wg = 1.0 / math.sqrt(self.in_channels * self.kernel_size ** 2)
        wk = params["weight"].astype(x.dtype) * wg
        x = jax.lax.conv_general_dilated(
            x, wk, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        return jnp.clip(x + params["bias"].astype(x.dtype), -256, 256), {}
