"""Smooth (FIR) up/down-sampling used by the StyleGAN2-ADA synthesis path.

Reference semantics (``/root/reference/backbone/stylegan2_ada/utils.py:54-95``):

  SmoothUpsample:   nearest x2 -> ReplicationPad2d((2,1,2,1)) -> 4x4 binomial
                    FIR (sum-normalized) valid conv.
  SmoothDownsample: ReplicationPad2d((2,1,2,1)) -> 4x4 FIR -> nearest 0.5
                    (keep every even pixel).

The 4x4 binomial kernel is the rank-1 outer product of [1,3,3,1]/8, so each
pass is implemented as two 1-D depthwise convolutions — half the FLOPs and a
layout the VPU likes. NHWC throughout.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_K1D = np.array([1.0, 3.0, 3.0, 1.0], dtype=np.float32) / 8.0  # sums to 1


def _dw_conv_1d(x: jax.Array, k: np.ndarray, axis: int) -> jax.Array:
    """Depthwise valid conv with a 1-D kernel along H (axis=1) or W (axis=2)."""
    c = x.shape[-1]
    if axis == 1:
        w = jnp.asarray(k, x.dtype)[:, None, None, None]
    else:
        w = jnp.asarray(k, x.dtype)[None, :, None, None]
    w = jnp.tile(w, (1, 1, 1, c))
    return lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=x.dtype)


def _edge_pad(x: jax.Array, axis: int, lo: int, hi: int) -> jax.Array:
    cfg = [(0, 0)] * 4
    cfg[axis] = (lo, hi)
    return jnp.pad(x, cfg, mode="edge")


def smooth_upsample(x: jax.Array) -> jax.Array:
    """NHWC nearest x2 + replication-pad (top/left 2, bottom/right 1) + FIR."""
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    x = _edge_pad(x, 1, 2, 1)
    x = _dw_conv_1d(x, _K1D, axis=1)
    x = _edge_pad(x, 2, 2, 1)
    x = _dw_conv_1d(x, _K1D, axis=2)
    return x


def smooth_downsample(x: jax.Array) -> jax.Array:
    """NHWC replication-pad + FIR + keep-every-even-pixel."""
    x = _edge_pad(x, 1, 2, 1)
    x = _dw_conv_1d(x, _K1D, axis=1)
    x = _edge_pad(x, 2, 2, 1)
    x = _dw_conv_1d(x, _K1D, axis=2)
    return x[:, ::2, ::2, :]
