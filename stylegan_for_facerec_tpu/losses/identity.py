"""Identity-similarity losses for stage-2 inversion training.

Parity targets:
  * ``IDLoss`` — ``/root/reference/restyle-encoder/criteria/id_loss.py``:
    crop [35:223, 32:220], adaptive-pool to 112, IR-SE-50 embedding
    (L2-normalized per ``models/encoders/model_irse.py:44-48``),
    loss = mean(1 - <emb(y_hat), stopgrad(emb(y))>), plus the
    similarity-improvement diagnostic.
  * ``MocoLoss`` — ``criteria/moco_loss.py``: same contract with a MoCo-v2
    ResNet-50 feature extractor (224 resize + L2 norm).
  * ``WNormLoss`` — ``criteria/w_norm.py:5-14``.

Both similarity losses take the feature extractor as a (fn, params)
pair so any embedding network plugs in; ``make_irse_id_extractor`` builds
the reference's IR-SE-50 one.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn import AdaptiveAvgPool2d, Ctx, Layer
from ..ops.image import resize_bilinear
from ..models.irse import Backbone


def w_norm_loss(latent: jax.Array, latent_avg: Optional[jax.Array] = None,
                start_from_latent_avg: bool = True) -> jax.Array:
    """``w_norm.py:5-14``: sum over batch of ||latent (- avg)||_F / B."""
    if start_from_latent_avg:
        latent = latent - latent_avg
    norms = jnp.sqrt(jnp.sum(jnp.square(latent), axis=(1, 2)))
    return jnp.sum(norms) / latent.shape[0]


def make_irse_id_extractor(params, state, input_size: int = 112):
    """The IDLoss feature path (id_loss.py:17-21): crop the face region,
    pool to 112, IR-SE-50, L2-normalize."""
    backbone = Backbone(input_size=input_size, num_layers=50, mode="ir_se",
                        drop_ratio=0.6)
    pool = AdaptiveAvgPool2d(112)

    def extract(x):
        # the reference crops [35:223, 32:220] out of 256px inputs
        # (id_loss.py:19); scale the window to the actual resolution so
        # 112px pipeline images crop the SAME face region instead of a
        # clamped bottom-right corner
        h, w = x.shape[1], x.shape[2]
        t, b = round(35 * h / 256), round(223 * h / 256)
        l, r = round(32 * w / 256), round(220 * w / 256)
        x = x[:, t:b, l:r, :]
        x, _ = pool.apply({}, {}, x, Ctx(train=False))
        feats, _ = backbone.apply(params, state, x, Ctx(train=False))
        return feats / jnp.linalg.norm(feats, axis=1, keepdims=True)

    return extract


def make_moco_extractor(feature_fn):
    """MocoLoss feature path (moco_loss.py:40-45): resize 224, embed,
    L2-normalize. ``feature_fn`` maps (B,224,224,3) -> (B, D)."""

    def extract(x):
        x = resize_bilinear(x, 224, 224)
        f = feature_fn(x)
        return f / jnp.linalg.norm(f, axis=1, keepdims=True)

    return extract


def similarity_loss(extract: Callable, y_hat: jax.Array, y: jax.Array,
                    x: jax.Array):
    """Shared body of IDLoss/MocoLoss forward (id_loss.py:23-46):
    returns (loss, sim_improvement, logs) with y's features detached."""
    x_feats = extract(x)
    y_feats = jax.lax.stop_gradient(extract(y))
    y_hat_feats = extract(y_hat)
    diff_target = jnp.sum(y_hat_feats * y_feats, axis=1)
    diff_input = jnp.sum(y_hat_feats * x_feats, axis=1)
    diff_views = jnp.sum(y_feats * x_feats, axis=1)
    loss = jnp.mean(1.0 - diff_target)
    sim_improvement = jnp.mean(diff_target - diff_views)
    logs = {"diff_target": diff_target, "diff_input": diff_input,
            "diff_views": diff_views}
    return loss, sim_improvement, logs


def id_loss(facenet_params, facenet_state, y_hat, y, x):
    extract = make_irse_id_extractor(facenet_params, facenet_state)
    return similarity_loss(extract, y_hat, y, x)
