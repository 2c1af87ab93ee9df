"""ReStyle e4e: progressive encoder, latent discriminator, codes pool,
and the e4e inversion model.

Parity targets:
  * ``/root/reference/restyle-encoder/models/encoders/restyle_e4e_encoders.py``
    — ``ProgressiveStage`` (0..18), ``ProgressiveBackboneEncoder`` (w0
    broadcast + per-stage deltas, the fork's spatial-9 style heads);
  * ``.../models/e4e_modules/discriminator.py`` — 4-layer latent MLP;
  * ``.../models/e4e_modules/latent_codes_pool.py`` — w replay buffer;
  * ``.../models/e4e.py`` — same shape as pSp with the progressive encoder.
"""

from __future__ import annotations

import dataclasses
import random
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import (BatchNorm2d, Conv2d, Layer, LeakyReLU, Linear, PReLU,
                  Sequential, init_child)
from .irse import BottleneckIR, get_blocks
from .psp import GradualStyleBlock, PSp

PROGRESSIVE_STAGE_INFERENCE = 18


@dataclasses.dataclass(frozen=True)
class ProgressiveBackboneEncoder(Layer):
    """``restyle_e4e_encoders.py:32-90``. ``stage`` (static) selects how
    many deltas are active: w = broadcast(styles[0](x)); w[:, i] +=
    styles[i](x) for i in 1..min(stage, n_styles-1)."""

    num_layers: int = 50
    mode: str = "ir_se"
    n_styles: int = 18
    input_nc: int = 6
    stage: int = PROGRESSIVE_STAGE_INFERENCE
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

    def set_stage(self, stage: int) -> "ProgressiveBackboneEncoder":
        """Progressive-training stage switch (params are shared across
        stages; only the static forward changes)."""
        return dataclasses.replace(self, stage=stage)

    def deltas_starting_dimensions(self) -> List[int]:
        return list(range(self.n_styles))

    def apply(self, params, state, x, ctx):
        ch = self._children()
        new_state = {}
        for name in ("input_layer", "body"):
            x, ns = ch[name].apply(params[name], state.get(name, {}), x,
                                   ctx)
            new_state[name] = ns
        w0, _ = ch["styles.0"].apply(params["styles.0"], {}, x, ctx)
        ws = [w0]
        for i in range(1, self.n_styles):
            if i <= min(self.stage, self.n_styles - 1):
                delta, _ = ch[f"styles.{i}"].apply(params[f"styles.{i}"],
                                                   {}, x, ctx)
                ws.append(w0 + delta)
            else:
                ws.append(w0)
        return jnp.stack(ws, axis=1), new_state


@dataclasses.dataclass(frozen=True)
class LatentCodesDiscriminator(Layer):
    """``e4e_modules/discriminator.py:4-20``: (n_mlp-1) x [Linear + LReLU
    0.2] + Linear(512, 1)."""

    style_dim: int = 512
    n_mlp: int = 4

    def _children(self):
        layers = []
        for _ in range(self.n_mlp - 1):
            layers += [Linear(self.style_dim, self.style_dim,
                              init_mode="torch_default"), LeakyReLU(0.2)]
        layers += [Linear(512, 1, init_mode="torch_default")]
        return {"mlp": Sequential(*layers)}

    def init(self, key):
        return init_child(self._children(), key)

    def apply(self, params, state, w, ctx):
        return self._children()["mlp"].apply(params["mlp"], {}, w, ctx)


class LatentCodesPool:
    """``e4e_modules/latent_codes_pool.py:5-55`` — host-side replay buffer
    (numpy arrays, python RNG)."""

    def __init__(self, pool_size: int, seed: int = 0):
        self.pool_size = pool_size
        self.rng = random.Random(seed)
        self.num_ws = 0
        self.ws: List[np.ndarray] = []

    def query(self, ws: np.ndarray) -> np.ndarray:
        if self.pool_size == 0:
            return ws
        out = []
        for w in np.asarray(ws):
            if w.ndim == 2:   # (n_latent, 512): pick a random latent row
                w = w[self.rng.randint(0, len(w) - 1)]
            self._handle(w, out)
        return np.stack(out, 0)

    def _handle(self, w, out):
        if self.num_ws < self.pool_size:
            self.num_ws += 1
            self.ws.append(w)
            out.append(w)
        elif self.rng.uniform(0, 1) > 0.5:
            rid = self.rng.randint(0, self.pool_size - 1)
            tmp = self.ws[rid].copy()
            self.ws[rid] = w
            out.append(tmp)
        else:
            out.append(w)


@dataclasses.dataclass(frozen=True)
class E4e(PSp):
    """``models/e4e.py:16-154``: identical to pSp but with the progressive
    encoder; forward contract (residual latent step, face pool) inherited."""

    stage: int = PROGRESSIVE_STAGE_INFERENCE

    def _children(self):
        from .psp import style_spatial_for
        d = super()._children()
        d["encoder"] = ProgressiveBackboneEncoder(
            self.encoder_num_layers, "ir_se", self.n_styles,
            input_nc=self.input_nc, stage=self.stage,
            style_spatial=style_spatial_for(self.input_size))
        return d

    def set_stage(self, stage: int) -> "E4e":
        return dataclasses.replace(self, stage=stage)
