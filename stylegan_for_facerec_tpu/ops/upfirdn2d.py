"""upfirdn2d — fused upsample / FIR filter / downsample / crop, TPU-native.

Replaces the reference's CUDA kernel
(``/root/reference/backbone/stylegan2/op/upfirdn2d_kernel.cu``) and its
autograd wrapper (``.../op/upfirdn2d.py``). The ground-truth semantics are
the pure-torch twin ``upfirdn2d_native`` (``.../op/upfirdn2d.py:150-184``):

    1. zero-insert upsample by ``up`` (each pixel followed by up-1 zeros),
    2. pad by (pad0, pad1) per spatial axis — negative pads crop,
    3. 2-D convolution with the *flipped* FIR kernel (i.e. true convolution),
    4. subsample by ``down``.

On TPU all four steps map onto a single
``lax.conv_general_dilated``: ``lhs_dilation`` performs the zero-insertion,
explicit (possibly negative) padding does pad/crop, ``window_strides`` the
down-sampling, and ``feature_group_count=C`` makes it depthwise. XLA compiles
this to one fused kernel, and autodiff derives the transposed form that the
reference hand-writes as ``UpFirDn2dBackward``. A separable fast path splits
rank-1 kernels (all StyleGAN blur kernels are binomial outer products) into
two cheap 1-D passes.

Layout: NHWC (the reference native op is NHWC as well).
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _as_pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def _pads(pad) -> Tuple[int, int, int, int]:
    if len(pad) == 2:
        return pad[0], pad[1], pad[0], pad[1]
    return tuple(pad)  # (x0, x1, y0, y1)


def _separable_factors(kernel: np.ndarray):
    """If kernel is (numerically) rank-1, return (col, row) 1-D factors with
    kernel = outer(col, row); else None."""
    if kernel.ndim != 2:
        return None
    u, s, vt = np.linalg.svd(kernel.astype(np.float64))
    if s.size > 1 and s[1] > 1e-10 * max(s[0], 1e-30):
        return None
    col = u[:, 0] * np.sqrt(s[0])
    row = vt[0, :] * np.sqrt(s[0])
    # keep positive orientation for numerical friendliness
    if col.sum() < 0:
        col, row = -col, -row
    return col.astype(kernel.dtype), row.astype(kernel.dtype)


def upfirdn2d(x: jax.Array, kernel, up: Union[int, Sequence[int]] = 1,
              down: Union[int, Sequence[int]] = 1,
              pad: Sequence[int] = (0, 0)) -> jax.Array:
    """NHWC upfirdn2d with reference semantics
    (``/root/reference/backbone/stylegan2/op/upfirdn2d.py:142-147``:
    ``pad=(p0, p1)`` applies to both axes; 4-tuple is (x0, x1, y0, y1))."""
    up_x, up_y = _as_pair(up) if not isinstance(up, int) else (up, up)
    down_x, down_y = _as_pair(down) if not isinstance(down, int) else (down, down)
    pad_x0, pad_x1, pad_y0, pad_y1 = _pads(pad)

    kernel = np.asarray(kernel, dtype=np.float32)
    c = x.shape[-1]
    sep = _separable_factors(kernel)

    def dw_conv(inp, k2d, ud_y, ud_x, dn_y, dn_x, py, px):
        kh, kw = k2d.shape
        w = jnp.asarray(k2d[::-1, ::-1], inp.dtype)  # flip -> true convolution
        w = jnp.tile(w[:, :, None, None], (1, 1, 1, c))
        return lax.conv_general_dilated(
            inp, w,
            window_strides=(dn_y, dn_x),
            padding=[py, px],
            lhs_dilation=(ud_y, ud_x),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            preferred_element_type=inp.dtype,
        )

    # zero-insertion leaves (H-1)*up+1 samples; the native op appends the
    # trailing up-1 zeros too, so fold them into the high-side pad.
    py = (pad_y0, pad_y1 + (up_y - 1))
    px = (pad_x0, pad_x1 + (up_x - 1))

    if sep is not None and kernel.shape[0] > 1 and kernel.shape[1] > 1:
        col, row = sep
        y = dw_conv(x, col[:, None], up_y, 1, down_y, 1, py, (0, 0))
        y = dw_conv(y, row[None, :], 1, up_x, 1, down_x, (0, 0), px)
        return y
    return dw_conv(x, kernel, up_y, up_x, down_y, down_x, py, px)


def upfirdn2d_ref(x: jax.Array, kernel, up=1, down=1, pad=(0, 0)) -> jax.Array:
    """Slow literal translation of ``upfirdn2d_native`` semantics in pure
    jnp — used only as a test oracle for the fused implementation."""
    # tuple order (x, y), matching the fused upfirdn2d above
    up_x, up_y = (up, up) if isinstance(up, int) else up
    down_x, down_y = (down, down) if isinstance(down, int) else down
    pad_x0, pad_x1, pad_y0, pad_y1 = _pads(pad)
    n, h, w, c = x.shape
    kernel = jnp.asarray(np.asarray(kernel, np.float32), x.dtype)
    kh, kw = kernel.shape

    # 1. zero-insert
    out = jnp.zeros((n, h * up_y, w * up_x, c), x.dtype)
    out = out.at[:, ::up_y, ::up_x, :].set(x)
    # 2. pad / crop
    out = jnp.pad(out, ((0, 0), (max(pad_y0, 0), max(pad_y1, 0)),
                        (max(pad_x0, 0), max(pad_x1, 0)), (0, 0)))
    out = out[:, max(-pad_y0, 0): out.shape[1] - max(-pad_y1, 0),
              max(-pad_x0, 0): out.shape[2] - max(-pad_x1, 0), :]
    # 3. correlate with flipped kernel == true convolution
    wk = jnp.tile(kernel[::-1, ::-1][:, :, None, None], (1, 1, 1, c))
    out = lax.conv_general_dilated(
        out, wk, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    # 4. subsample
    return out[:, ::down_y, ::down_x, :]


def make_resample_kernel(k) -> np.ndarray:
    """1-D -> outer-product 2-D FIR kernel, normalized to sum 1; matches
    ``Blur``/``Upsample`` kernel setup in
    ``/root/reference/backbone/stylegan2/model.py:29-87``."""
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    return k / k.sum()
