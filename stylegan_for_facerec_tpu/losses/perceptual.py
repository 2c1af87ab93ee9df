"""LPIPS perceptual loss (v0.1, AlexNet backbone), TPU-native.

Parity target: ``/root/reference/restyle-encoder/criteria/lpips/``
(``lpips.py:8-35``, ``networks.py:36-95``, ``utils.py:6-8``):

  score(x, y) = sum over tap layers of
      mean_spatial( lin_l( (norm(f_l(x)) - norm(f_l(y)))^2 ) )
  summed over batch then / B, where norm() is channel-unit-normalization
  and lin_l a frozen 1x1 conv.

AlexNet ``features`` (torchvision layout) is rebuilt in NHWC with taps
after each ReLU (channels 64/192/384/256/256). Pretrained weights load
through ``lpips_params_from_torch`` (torchvision alexnet state_dict +
richzhang lin weights); random-weight numerics are test-verified against a
torch oracle.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..nn import Conv2d, Ctx, Layer, MaxPool2d, init_child

# z-score buffers (networks.py:40-44), channel-last
_LPIPS_MEAN = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_STD = np.array([0.458, 0.448, 0.450], np.float32)

ALEX_CHANNELS = (64, 192, 384, 256, 256)
VGG_CHANNELS = (64, 128, 256, 512, 512)


def normalize_activation(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    """utils.py:6-8 (channel = last axis)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


@dataclasses.dataclass(frozen=True)
class AlexNetFeatures(Layer):
    """torchvision ``alexnet().features`` in NHWC; apply() returns the five
    unit-normalized tap activations (after ReLUs 2/5/8/10/12 in torch
    1-based layer counting, ``networks.py:77-81``)."""

    def _children(self):
        return {
            "0": Conv2d(3, 64, 11, stride=4, padding=2,
                        init_mode="torch_default"),
            "3": Conv2d(64, 192, 5, padding=2, init_mode="torch_default"),
            "6": Conv2d(192, 384, 3, padding=1, init_mode="torch_default"),
            "8": Conv2d(384, 256, 3, padding=1, init_mode="torch_default"),
            "10": Conv2d(256, 256, 3, padding=1, init_mode="torch_default"),
        }

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        pool = MaxPool2d(3, 2)
        taps = []

        x, _ = ch["0"].apply(params["0"], {}, x, ctx)
        x = jnp.maximum(x, 0)
        taps.append(normalize_activation(x))        # tap 2
        x, _ = pool.apply({}, {}, x, ctx)
        x, _ = ch["3"].apply(params["3"], {}, x, ctx)
        x = jnp.maximum(x, 0)
        taps.append(normalize_activation(x))        # tap 5
        x, _ = pool.apply({}, {}, x, ctx)
        x, _ = ch["6"].apply(params["6"], {}, x, ctx)
        x = jnp.maximum(x, 0)
        taps.append(normalize_activation(x))        # tap 8
        x, _ = ch["8"].apply(params["8"], {}, x, ctx)
        x = jnp.maximum(x, 0)
        taps.append(normalize_activation(x))        # tap 10
        x, _ = ch["10"].apply(params["10"], {}, x, ctx)
        x = jnp.maximum(x, 0)
        taps.append(normalize_activation(x))        # tap 12
        return taps, {}


@dataclasses.dataclass(frozen=True)
class VGG16Features(Layer):
    """torchvision ``vgg16().features`` in NHWC; five unit-normalized taps
    after ReLUs 4/9/16/23/30 (``networks.py:85-95``)."""

    # conv layer indices in the torchvision features Sequential, grouped by
    # pooling stage; taps come after the last ReLU of each stage
    _CFG = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))
    _CHANNELS = ((3, 64, 64), (64, 128, 128), (128, 256, 256, 256),
                 (256, 512, 512, 512), (512, 512, 512, 512))

    def _children(self):
        d = {}
        for stage, idxs in enumerate(self._CFG):
            chans = self._CHANNELS[stage]
            for j, idx in enumerate(idxs):
                d[str(idx)] = Conv2d(chans[j], chans[j + 1], 3, padding=1,
                                     init_mode="torch_default")
        return d

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, x, ctx):
        ch = self._children()
        pool = MaxPool2d(2, 2)
        taps = []
        for stage, idxs in enumerate(self._CFG):
            if stage > 0:
                x, _ = pool.apply({}, {}, x, ctx)
            for idx in idxs:
                x, _ = ch[str(idx)].apply(params[str(idx)], {}, x, ctx)
                x = jnp.maximum(x, 0)
            taps.append(normalize_activation(x))
        return taps, {}


@dataclasses.dataclass(frozen=True)
class LPIPS(Layer):
    """apply() inputs (x, y) in [-1, 1] NHWC; returns scalar LPIPS."""

    net_type: str = "alex"

    @property
    def _channels(self):
        return ALEX_CHANNELS if self.net_type == "alex" else VGG_CHANNELS

    def _children(self):
        if self.net_type == "alex":
            return {"net": AlexNetFeatures()}
        if self.net_type == "vgg":
            return {"net": VGG16Features()}
        raise ValueError(f"net_type {self.net_type!r}: alex|vgg")

    def init(self, key):
        kn, kl = jax.random.split(key)
        params, state = init_child(self._children(), kn)
        lins = {}
        lkeys = jax.random.split(kl, len(self._channels))
        for i, (c, k) in enumerate(zip(self._channels, lkeys)):
            # frozen 1x1 conv, no bias (networks.py:23-30); keep positive
            # init so random-weight tests produce positive scores
            lins[f"lin.{i}"] = {"weight": jnp.abs(
                jax.random.normal(k, (1, 1, c, 1)) * 0.1)}
        params.update(lins)
        return params, state

    def apply(self, params, state, inputs, ctx):
        x, y = inputs
        mean = jnp.asarray(_LPIPS_MEAN, x.dtype)
        std = jnp.asarray(_LPIPS_STD, x.dtype)
        xs = (x - mean) / std
        ys = (y - mean) / std
        net = self._children()["net"]
        fx, _ = net.apply(params["net"], {}, xs, ctx)
        fy, _ = net.apply(params["net"], {}, ys, ctx)
        total = jnp.zeros((), jnp.float32)
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = jnp.square(a - b)
            w = params[f"lin.{i}"]["weight"].astype(d.dtype)
            r = lax.conv_general_dilated(
                d, w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            total = total + jnp.sum(jnp.mean(
                r.astype(jnp.float32), axis=(1, 2)))
        return total / x.shape[0], {}


def lpips_params_from_torch(alexnet_features_sd, lin_sd) -> dict:
    """Build LPIPS params from torchvision ``alexnet().features``
    state_dict and the richzhang lin state_dict (keys '0.1.weight'.. after
    the renames of utils.py:22-30)."""
    net = {}
    for idx in ("0", "3", "6", "8", "10"):
        w = np.asarray(alexnet_features_sd[f"{idx}.weight"])
        b = np.asarray(alexnet_features_sd[f"{idx}.bias"])
        net[idx] = {"weight": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                    "bias": jnp.asarray(b)}
    params = {"net": net}
    for i in range(5):
        w = np.asarray(lin_sd[f"{i}.1.weight"])  # (1, C, 1, 1)
        params[f"lin.{i}"] = {"weight": jnp.asarray(
            np.transpose(w, (2, 3, 1, 0)))}
    return params
