"""Style-modulated convolution (StyleGAN2), TPU-native formulation.

Reference (``/root/reference/backbone/stylegan2_ada/utils.py:120-137``)
builds per-sample weights ``w[b] = weight * styles[b]`` (optionally
demodulated by ``rsqrt(sum(w^2) + 1e-8)``) and runs one grouped conv with
``groups=batch``. On TPU that shape (B*O, I, k, k) defeats MXU tiling and
explodes memory for large batches.

Because convolution is linear, the exact same computation factors into the
*scaled-activation* form used here:

    y[b] = dcoef[b] * conv(x[b] * styles[b], weight)

with ``dcoef[b,o] = rsqrt(sum_i styles[b,i]^2 * sum_k weight[o,i,k]^2 + eps)``
— one shared-weight convolution (a single large MXU matmul after im2col) plus
two cheap elementwise scalings, identical numerics up to float associativity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def modulated_conv2d(x: jax.Array, weight: jax.Array, styles: jax.Array,
                     padding: int = 0, demodulate: bool = True,
                     eps: float = 1e-8) -> jax.Array:
    """x: (N, H, W, I) NHWC; weight: (kh, kw, I, O) HWIO; styles: (N, I).

    Matches ``modulated_conv2d`` in the reference (same eps placement:
    demod coefficients are computed from the *modulated* weight).
    """
    x_mod = x * styles[:, None, None, :].astype(x.dtype)
    y = lax.conv_general_dilated(
        x_mod, weight.astype(x.dtype), (1, 1),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    if demodulate:
        # sum_k weight^2 -> (I, O); contract styles^2 -> (N, O)
        w_sq = jnp.sum(jnp.square(weight.astype(jnp.float32)), axis=(0, 1))
        ssq = jnp.square(styles.astype(jnp.float32))
        denom = ssq @ w_sq + eps
        dcoefs = lax.rsqrt(denom).astype(y.dtype)
        y = y * dcoefs[:, None, None, :]
    return y


def modulated_conv2d_grouped(x: jax.Array, weight: jax.Array,
                             styles: jax.Array, padding: int = 0,
                             demodulate: bool = True,
                             eps: float = 1e-8) -> jax.Array:
    """Literal per-sample-weight formulation (test oracle; mirrors the
    reference's grouped-conv trick). Slow — do not use in training."""
    kh, kw, ci, co = weight.shape
    n = x.shape[0]
    w = weight[None] * styles[:, None, None, :, None]  # (N, kh, kw, I, O)
    if demodulate:
        d = lax.rsqrt(jnp.sum(jnp.square(w), axis=(1, 2, 3)) + eps)
        w = w * d[:, None, None, None, :]

    def one(xb, wb):
        return lax.conv_general_dilated(
            xb[None], wb, (1, 1),
            padding=[(padding, padding), (padding, padding)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

    return jax.vmap(one)(x, w)
