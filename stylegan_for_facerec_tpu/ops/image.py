"""On-device image primitives (NHWC) replacing the reference's host-side
PIL/torchvision loops.

The reference does eval-time TTA with a *per-image* PIL round trip
(``/root/reference/util/utils.py:204-236``): de-normalize -> uint8 PIL ->
Resize([128,128]) -> CenterCrop(112) -> re-normalize, plus horizontal flip.
Here those become batched jnp ops that run on-chip; ``resize_bilinear``
reproduces torch/PIL half-pixel bilinear interpolation *exactly* via two
sparse interpolation matmuls (MXU-friendly, no gathers).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(in_size, out_size) matrix M with out = M.T @ in implementing
    half-pixel bilinear interpolation (torch ``F.interpolate(mode='bilinear',
    align_corners=False)`` and PIL upsampling semantics)."""
    m = np.zeros((in_size, out_size), dtype=np.float32)
    scale = in_size / out_size
    for o in range(out_size):
        src = (o + 0.5) * scale - 0.5
        lo = int(np.floor(src))
        frac = src - lo
        lo_c = min(max(lo, 0), in_size - 1)
        hi_c = min(max(lo + 1, 0), in_size - 1)
        m[lo_c, o] += 1.0 - frac
        m[hi_c, o] += frac
    return m


def resize_bilinear(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize NHWC, half-pixel centers, no anti-aliasing.

    Same semantics as ``torch.nn.functional.interpolate(...,
    mode='bilinear', align_corners=False)`` used at
    ``/root/reference/backbone/restyle_psp.py:443`` and
    ``coach_restyle_psp.py:82,156``. Interpolation weights are computed
    in f64 here vs torch's internal source-index math, so agreement is
    ~1e-4 abs (not bit-exact) at e.g. 256->224; parity tests downstream
    of a resize should use tolerances accordingly.
    """
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    mh = jnp.asarray(_interp_matrix(h, out_h), x.dtype)
    mw = jnp.asarray(_interp_matrix(w, out_w), x.dtype)
    y = jnp.einsum("nhwc,hH->nHwc", x, mh)
    y = jnp.einsum("nHwc,wW->nHWc", y, mw)
    return y


@functools.lru_cache(maxsize=64)
def _interp_matrix_align_corners(in_size: int, out_size: int) -> np.ndarray:
    """align_corners=True variant (torch ``nn.UpsamplingBilinear2d``):
    src = o * (in-1)/(out-1)."""
    m = np.zeros((in_size, out_size), dtype=np.float32)
    scale = (in_size - 1) / max(out_size - 1, 1)
    for o in range(out_size):
        src = o * scale
        lo = int(np.floor(src))
        frac = src - lo
        hi = min(lo + 1, in_size - 1)
        m[lo, o] += 1.0 - frac
        m[hi, o] += frac
    return m


def resize_bilinear_align_corners(x: jax.Array, out_h: int,
                                  out_w: int) -> jax.Array:
    """torch ``nn.UpsamplingBilinear2d`` (align_corners=True), NHWC."""
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    mh = jnp.asarray(_interp_matrix_align_corners(h, out_h), x.dtype)
    mw = jnp.asarray(_interp_matrix_align_corners(w, out_w), x.dtype)
    y = jnp.einsum("nhwc,hH->nHwc", x, mh)
    return jnp.einsum("nHwc,wW->nHWc", y, mw)


def hflip(x: jax.Array) -> jax.Array:
    """Horizontal flip (W axis), NHWC."""
    return x[:, :, ::-1, :]


def center_crop(x: jax.Array, size: int) -> jax.Array:
    h, w = x.shape[1], x.shape[2]
    top = (h - size) // 2
    left = (w - size) // 2
    return x[:, top:top + size, left:left + size, :]


def quantize_uint8_roundtrip(x: jax.Array) -> jax.Array:
    """Emulate the reference's ToPILImage/ToTensor uint8 round trip on
    [-1, 1] inputs (``util/utils.py:199-228``): x in [-1,1] -> uint8 ->
    back to [-1,1].

    torchvision ToPILImage converts via ``pic.mul(255).byte()`` —
    TRUNCATION — so floor (not round) is the faithful in-range mapping;
    identical for uint8-origin data (x01*255 integral), and matches the
    reference for off-grid (e.g. synthesized) pixels too. Deliberate
    deviation: out-of-range values clip here where ``.byte()`` would
    wrap around (a torch quirk, not a behavior worth preserving)."""
    x01 = jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)
    q = jnp.floor(x01 * 255.0)
    return (q / 255.0 - 0.5) / 0.5


def ccrop_tta(x: jax.Array, resize_to: int = 128, crop: int = 112,
              quantize: bool = True) -> jax.Array:
    """The reference's eval-time center-crop TTA (``util/utils.py:221-236``):
    resize to ``resize_to`` square then center-crop ``crop``; optionally
    mirror the PIL uint8 quantization for exact parity."""
    if quantize:
        x = quantize_uint8_roundtrip(x)
    y = resize_bilinear(x, resize_to, resize_to)
    y = center_crop(y, crop)
    if quantize:
        y = quantize_uint8_roundtrip(y)
    return y


def normalize_pm1(x01: jax.Array) -> jax.Array:
    """[0,1] -> [-1,1] (Normalize(0.5, 0.5) everywhere in the reference)."""
    return (x01 - 0.5) / 0.5


def random_crop(key: jax.Array, x: jax.Array, size: int) -> jax.Array:
    """Batched random crop (one offset per image), on-device replacement for
    torchvision ``RandomCrop(112)`` in the stage-3 input pipeline
    (``/root/reference/train.py:109-117``)."""
    n, h, w, c = x.shape
    kh, kw = jax.random.split(key)
    tops = jax.random.randint(kh, (n,), 0, h - size + 1)
    lefts = jax.random.randint(kw, (n,), 0, w - size + 1)

    def crop_one(img, t, l):
        return jax.lax.dynamic_slice(img, (t, l, 0), (size, size, c))

    return jax.vmap(crop_one)(x, tops, lefts)


def random_hflip(key: jax.Array, x: jax.Array, p: float = 0.5) -> jax.Array:
    """Batched per-image random horizontal flip."""
    flips = jax.random.bernoulli(key, p, (x.shape[0],))
    return jnp.where(flips[:, None, None, None], x[:, :, ::-1, :], x)
