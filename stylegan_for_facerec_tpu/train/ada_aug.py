"""Full ADA (adaptive discriminator augmentation) pipeline, NHWC.

The reference delegates stage-1 training to stylegan2-ada-lightning with
``ada_target: 0.6`` (``/root/reference/configs/stage_1_config.yaml:30-33``),
whose augmentation policy is the full stylegan2-ada menu. This module
implements that menu TPU-natively with per-image Bernoulli(p) gating per
group:

  pixel blitting   x-flip, 90-degree rotations, integer translation
  geometric        iso scale, pre-rotation, aniso scale, post-rotation,
                   fractional translation -- composed into ONE affine
                   matrix per image and applied with a single bilinear
                   warp (``jax.scipy.ndimage.map_coordinates``)
  color            brightness, contrast, luma flip, hue rotation,
                   saturation -- composed into ONE 4x4 color matrix per
                   image and applied as a single einsum (MXU)
  filtering        4 dyadic frequency bands amplified/attenuated with
                   lognormal gains (separable binomial band filters)
  corruption       additive RGB noise, cutout (0.5-size rectangle)

Parameter distributions follow the stylegan2-ada policy (lognormal
2^N(0,0.2) scales, U(-pi,pi) rotations with p_rot = 1-sqrt(1-p),
N(0,0.125) fractional translate, 2^N(0,0.5) contrast, 2^N(0,1)
saturation/band gains, |N(0,0.1)| noise sigma). Deliberate deviations
from the NVIDIA kernels, documented for the parity ledger: bilinear
resampling instead of wavelet-orthogonal upfirdn resampling, and binomial
(instead of sym2-wavelet) band-pass filters with uniform energy weights.
Both preserve the policy's distributional shape, which is what the ADA
controller feedback loop consumes.

SPMD design: the pipeline is split into ``sample_ada_params`` (tiny
batched random tensors + one noise field, all leading-dim == batch) and
``apply_ada`` (DETERMINISTIC, strictly per-image). Under a mesh the
trainer runs ``apply_ada`` inside ``shard_map`` over the data axis
(``stage1.Stage1Trainer._augment``): the SPMD partitioner never sees the
warp's gather/scatter graphs (round-3 finding: partitioning them took
minutes of XLA:CPU compile), every shard applies exactly the transforms
its images sampled, and sharded results are bit-identical to
single-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# pixel blitting
# ---------------------------------------------------------------------------

def sample_blit(key, n: int, h: int, p):
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    max_t = max(1, int(0.125 * h))
    do_t = jax.random.bernoulli(k4, p, (n,))
    return {
        # xflip draws i in {0,1} uniformly and applies it at rate p
        # (stylegan2-ada policy: identity is a valid draw), so the
        # effective flip rate is p/2 — same shape as rot90's k=0 draw
        "flip": jax.random.bernoulli(k1, p, (n,))
        & jax.random.bernoulli(k7, 0.5, (n,)),
        "rotk": jnp.where(jax.random.bernoulli(k2, p, (n,)),
                          jax.random.randint(k3, (n,), 0, 4), 0),
        "ty": jnp.where(do_t, jax.random.randint(
            k5, (n,), -max_t, max_t + 1), 0),
        "tx": jnp.where(do_t, jax.random.randint(
            k6, (n,), -max_t, max_t + 1), 0),
    }


def apply_blit(x, prm):
    x = jnp.where(prm["flip"][:, None, None, None], x[:, :, ::-1, :], x)
    # 90-degree rotations via selects (a stacked gather is SPMD-hostile)
    kk = prm["rotk"][:, None, None, None]
    r1 = jnp.rot90(x, 1, axes=(1, 2))
    r2 = jnp.rot90(x, 2, axes=(1, 2))
    r3 = jnp.rot90(x, 3, axes=(1, 2))
    x = jnp.where(kk == 1, r1, jnp.where(kk == 2, r2,
                                         jnp.where(kk == 3, r3, x)))
    h = x.shape[1]
    max_t = max(1, int(0.125 * h))

    def translate(img, dy, dx):
        return jax.lax.dynamic_slice(
            jnp.pad(img, ((max_t, max_t), (max_t, max_t), (0, 0))),
            (max_t + dy, max_t + dx, 0), img.shape)

    return jax.vmap(translate)(x, prm["ty"], prm["tx"])


# ---------------------------------------------------------------------------
# general geometric: one affine warp per image
# ---------------------------------------------------------------------------

def _rot2(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s], -1),
                      jnp.stack([s, c], -1)], -2)          # (..., 2, 2)


def _diag2(a, b):
    z = jnp.zeros_like(a)
    return jnp.stack([jnp.stack([a, z], -1),
                      jnp.stack([z, b], -1)], -2)


def sample_geom(key, n: int, h: int, w: int, p):
    ks = jax.random.split(key, 10)
    p_rot = 1.0 - jnp.sqrt(jnp.clip(1.0 - p, 0.0, 1.0))
    do_iso = jax.random.bernoulli(ks[0], p, (n,))
    s_iso = jnp.where(do_iso,
                      jnp.exp2(jax.random.normal(ks[1], (n,)) * 0.2), 1.0)
    do_r1 = jax.random.bernoulli(ks[2], p_rot, (n,))
    th1 = jnp.where(do_r1, jax.random.uniform(
        ks[3], (n,), minval=-jnp.pi, maxval=jnp.pi), 0.0)
    do_ani = jax.random.bernoulli(ks[4], p, (n,))
    s_ani = jnp.where(do_ani,
                      jnp.exp2(jax.random.normal(ks[5], (n,)) * 0.2), 1.0)
    do_r2 = jax.random.bernoulli(ks[6], p_rot, (n,))
    th2 = jnp.where(do_r2, jax.random.uniform(
        ks[7], (n,), minval=-jnp.pi, maxval=jnp.pi), 0.0)
    do_t = jax.random.bernoulli(ks[8], p, (n,))
    t = jnp.where(do_t[:, None],
                  jax.random.normal(ks[9], (n, 2)) * 0.125, 0.0) \
        * jnp.asarray([h, w], jnp.float32)
    # inverse of M = T R2 S_ani R1 S_iso acting on centered (y, x)
    lin_inv = _diag2(1.0 / s_iso, 1.0 / s_iso) @ _rot2(-th1) \
        @ _diag2(1.0 / s_ani, s_ani) @ _rot2(-th2)       # (n, 2, 2)
    return {"lin_inv": lin_inv, "t": t,
            "active": do_iso | do_r1 | do_ani | do_r2 | do_t}


def apply_geom(x, prm):
    n, h, w, c = x.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32) - cy
    xs = jnp.arange(w, dtype=jnp.float32) - cx
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")           # (h, w)
    dst = jnp.stack([gy, gx], 0).reshape(2, -1)            # (2, h*w)
    src = prm["lin_inv"] @ (dst[None] - prm["t"][:, :, None])
    src = src + jnp.asarray([cy, cx], jnp.float32)[None, :, None]

    def warp_one(img, coords):
        def warp_ch(ch):
            return jax.scipy.ndimage.map_coordinates(
                ch, [coords[0], coords[1]], order=1, mode="constant",
                cval=0.0)
        out = jax.vmap(warp_ch, in_axes=2, out_axes=1)(img)  # (h*w, c)
        return out.reshape(h, w, c)

    warped = jax.vmap(warp_one)(x.astype(jnp.float32), src).astype(x.dtype)
    return jnp.where(prm["active"][:, None, None, None], warped, x)


# ---------------------------------------------------------------------------
# color: one 4x4 homogeneous color matrix per image
# ---------------------------------------------------------------------------

# host-side constant: a module-level jnp array would make importing the
# train package the process's first device op (hangs if the tunnel wedges)
_LUMA = np.asarray([1.0, 1.0, 1.0]) / np.sqrt(3.0)


def sample_color(key, n: int, p):
    """brightness -> contrast -> luma flip -> hue rotate -> saturation,
    composed into one (n, 4, 4) matrix."""
    ks = jax.random.split(key, 9)
    eye = jnp.eye(4)[None].repeat(n, 0)
    v = _LUMA

    do_b = jax.random.bernoulli(ks[0], p, (n,))
    b = jnp.where(do_b, jax.random.normal(ks[1], (n,)) * 0.2, 0.0)
    m = eye.at[:, :3, 3].set(b[:, None] * jnp.ones((1, 3)))

    do_c = jax.random.bernoulli(ks[2], p, (n,))
    c = jnp.where(do_c, jnp.exp2(jax.random.normal(ks[3], (n,)) * 0.5),
                  1.0)
    mc = eye.at[:, jnp.arange(3), jnp.arange(3)].mul(c[:, None])
    m = mc @ m

    do_f = jax.random.bernoulli(ks[4], p, (n,))
    hh = jnp.eye(3) - 2.0 * jnp.outer(v, v)
    mf = eye.at[:, :3, :3].set(
        jnp.where(do_f[:, None, None], hh[None], jnp.eye(3)[None]))
    m = mf @ m

    do_h = jax.random.bernoulli(ks[5], p, (n,))
    th = jnp.where(do_h, jax.random.uniform(ks[6], (n,), minval=-jnp.pi,
                                            maxval=jnp.pi), 0.0)
    cth, sth = jnp.cos(th), jnp.sin(th)
    vx = jnp.asarray([[0, -v[2], v[1]],
                      [v[2], 0, -v[0]],
                      [-v[1], v[0], 0]])
    vv = jnp.outer(v, v)
    rot = (cth[:, None, None] * jnp.eye(3)[None]
           + sth[:, None, None] * vx[None]
           + (1 - cth)[:, None, None] * vv[None])     # Rodrigues
    m = eye.at[:, :3, :3].set(rot) @ m

    do_s = jax.random.bernoulli(ks[7], p, (n,))
    s = jnp.where(do_s, jnp.exp2(jax.random.normal(ks[8], (n,))), 1.0)
    ms = eye.at[:, :3, :3].set(
        vv[None] + (jnp.eye(3)[None] - vv[None]) * s[:, None, None])
    m = ms @ m
    return {"m": m, "active": do_b | do_c | do_f | do_h | do_s}


def apply_color(x, prm):
    m = prm["m"]
    xf = x.astype(jnp.float32)
    y = jnp.einsum("nij,nhwj->nhwi", m[:, :3, :3], xf) \
        + m[:, None, None, :3, 3]
    # gate-off images bypass the matmul bit-exactly (identity-matrix
    # einsum still rounds)
    return jnp.where(prm["active"][:, None, None, None],
                     y.astype(x.dtype), x)


# ---------------------------------------------------------------------------
# image-space filtering: 4 dyadic bands
# ---------------------------------------------------------------------------

_K_BINOMIAL = np.asarray([1.0, 2.0, 1.0]) / 4.0


def _sep_blur(x, k1d, times=1):
    """Separable depthwise blur, SAME/zero padding, NHWC."""
    c = x.shape[-1]
    kh = k1d.reshape(-1, 1, 1, 1) * jnp.ones((1, 1, 1, c))
    kw = k1d.reshape(1, -1, 1, 1) * jnp.ones((1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    for _ in range(times):
        x = jax.lax.conv_general_dilated(
            x, kh, (1, 1), "SAME", dimension_numbers=dn,
            feature_group_count=c)
        x = jax.lax.conv_general_dilated(
            x, kw, (1, 1), "SAME", dimension_numbers=dn,
            feature_group_count=c)
    return x


def sample_filter(key, n: int, p):
    """Lognormal per-band gains (2^N(0,1)), energy-normalized with
    uniform band weights."""
    ks = jax.random.split(key, 8)
    gains, dos = [], []
    for i in range(4):
        do = jax.random.bernoulli(ks[2 * i], p, (n,))
        g = jnp.where(do, jnp.exp2(jax.random.normal(ks[2 * i + 1], (n,))),
                      1.0)
        gains.append(g)
        dos.append(do)
    g = jnp.stack(gains, -1)                         # (n, 4)
    g = g / jnp.sqrt(jnp.mean(jnp.square(g), axis=-1, keepdims=True))
    return {"g": g, "active": dos[0] | dos[1] | dos[2] | dos[3]}


def apply_filter(x, prm):
    xf = x.astype(jnp.float32)
    lp1 = _sep_blur(xf, _K_BINOMIAL, 1)
    lp2 = _sep_blur(lp1, _K_BINOMIAL, 2)
    lp3 = _sep_blur(lp2, _K_BINOMIAL, 4)
    bands = [xf - lp1, lp1 - lp2, lp2 - lp3, lp3]   # high -> low
    g = prm["g"]
    y = sum(b * g[:, i, None, None, None] for i, b in enumerate(bands))
    # band reconstruction only telescopes exactly in exact arithmetic;
    # gate-off images keep their original pixels bit-exactly
    return jnp.where(prm["active"][:, None, None, None],
                     y.astype(x.dtype), x)


# ---------------------------------------------------------------------------
# corruptions: additive noise + cutout
# ---------------------------------------------------------------------------

def sample_corrupt(key, n: int, h: int, w: int, c: int, p):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    do_n = jax.random.bernoulli(k1, p, (n,))
    sigma = jnp.abs(jax.random.normal(k2, (n,))) * 0.1
    noise = jax.random.normal(k3, (n, h, w, c)) \
        * jnp.where(do_n, sigma, 0.0)[:, None, None, None]
    do_cut = jax.random.bernoulli(k4, p, (n,))
    center = jax.random.uniform(k5, (n, 2))
    return {"noise": noise, "do_noise": do_n, "cut": do_cut,
            "center": center}


def apply_corrupt(x, prm):
    n, h, w, _ = x.shape
    x = jnp.where(prm["do_noise"][:, None, None, None],
                  x + prm["noise"].astype(x.dtype), x)
    cy = prm["center"][:, 0] * h
    cx = prm["center"][:, 1] * w
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    in_y = jnp.abs(ys - cy[:, None, None]) < (h * 0.25)
    in_x = jnp.abs(xs - cx[:, None, None]) < (w * 0.25)
    mask = (in_y & in_x) & prm["cut"][:, None, None]
    return jnp.where(mask[..., None], jnp.zeros_like(x), x)


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------

def sample_ada_params(key, n: int, h: int, w: int, c: int, p):
    """All randomness of the pipeline as batched tensors (leading dim n);
    ``apply_ada`` is then deterministic and strictly per-image."""
    kb, kg, kc, kf, kn = jax.random.split(key, 5)
    return {"blit": sample_blit(kb, n, h, p),
            "geom": sample_geom(kg, n, h, w, p),
            "color": sample_color(kc, n, p),
            "filter": sample_filter(kf, n, p),
            "corrupt": sample_corrupt(kn, n, h, w, c, p)}


def apply_ada(x, prm):
    x = apply_blit(x, prm["blit"])
    x = apply_geom(x, prm["geom"])
    x = apply_color(x, prm["color"])
    x = apply_filter(x, prm["filter"])
    return apply_corrupt(x, prm["corrupt"])


def ada_augment(key: jax.Array, x: jax.Array, p) -> jax.Array:
    """Full ADA pipeline: every group gated per image at probability p."""
    n, h, w, c = x.shape
    return apply_ada(x, sample_ada_params(key, n, h, w, c, p))


def _single_group(sampler, applier, arity):
    def fn(key, x, p):
        n, h, w, c = x.shape
        args = {"n": (n,), "nh": (n, h), "nhw": (n, h, w),
                "nhwc": (n, h, w, c)}[arity]
        return applier(x, sampler(key, *args, p))
    return fn


blit_augment = _single_group(sample_blit, apply_blit, "nh")
geom_augment = _single_group(sample_geom, apply_geom, "nhw")
color_augment = _single_group(sample_color, apply_color, "n")
filter_augment = _single_group(sample_filter, apply_filter, "n")
corrupt_augment = _single_group(sample_corrupt, apply_corrupt, "nhwc")

AUG_GROUPS = (("blit", blit_augment),
              ("geom", geom_augment),
              ("color", color_augment),
              ("filter", filter_augment),
              ("corrupt", corrupt_augment))
