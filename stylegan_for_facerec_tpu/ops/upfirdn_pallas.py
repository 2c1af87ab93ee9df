"""Pallas TPU kernel for the StyleGAN2 smooth 2x upsample.

The TPU twin of the reference CUDA ``upfirdn2d`` kernel's hot dispatch mode
(up=2, 4-tap binomial, ``upfirdn2d_kernel.cu:177-211``), specialized to the
``SmoothUpsample`` semantics (nearest x2 + [1,3,3,1]/8 blur, i.e. the
[1,4,6,4,1]/8 zero-insert filter on an edge-padded input — see
ops/resample.py).

Polyphase decomposition: for up=2 with k = [1,4,6,4,1]/8 the two phases are
  even rows/cols:  out[2i]   = (x[i-1] + x[i]) / 2
  odd  rows/cols:  out[2i+1] = (x[i-1] + 6 x[i] + x[i+1]) / 8
(phases as the kernel body computes them, bit-equivalent to
ops/resample.smooth_upsample)
so the whole op is a handful of VPU adds per tile — one HBM read and one
HBM write, no intermediate 4x nearest tensor, no im2col.

Grid: (N, H/TILE_H). Each program DMAs its row-tile plus a 1-row halo from
HBM (edges clamped = replication padding), computes both phases for both
axes in VMEM, and writes the (2*TILE_H, 2W, C) output block.

MEASURED OUTCOME (v5e, bf16, B=128): the XLA path in ops/resample.py —
a fused separable upfirdn — runs at ~2x memory speed-of-light inside the
synthesis graph and BEATS this standalone kernel ~3x (1.96 ms vs 6.33 ms
at 64px/128ch), because XLA fuses the resample into the surrounding convs
while a pallas_call forces an HBM round trip and this kernel's three
sequential halo DMAs are not double-buffered. The kernel is kept as the
correctness-tested CUDA-twin reference and a starting point for a fused
conv+upsample kernel; production code uses ops/resample.py. Mosaic also
rejects the lane interleave for C < 128 (use the XLA path there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, out_ref, scratch, sems, *, tile_h, H, W, C):
    n = pl.program_id(0)
    i = pl.program_id(1)
    body_start = i * tile_h
    # three clamped DMAs: top halo row (edge-replicated), body, bottom halo
    top = jnp.maximum(body_start - 1, 0)
    bot = jnp.minimum(body_start + tile_h, H - 1)
    d_top = pltpu.make_async_copy(x_hbm.at[n, pl.ds(top, 1)],
                                  scratch.at[pl.ds(0, 1)], sems.at[0])
    d_body = pltpu.make_async_copy(x_hbm.at[n, pl.ds(body_start, tile_h)],
                                   scratch.at[pl.ds(1, tile_h)], sems.at[1])
    d_bot = pltpu.make_async_copy(x_hbm.at[n, pl.ds(bot, 1)],
                                  scratch.at[pl.ds(tile_h + 1, 1)],
                                  sems.at[2])
    d_top.start()
    d_body.start()
    d_bot.start()
    d_top.wait()
    d_body.wait()
    d_bot.wait()

    rows = scratch[...]                          # (tile_h+2, W, C)

    # vertical polyphase -> (2*tile_h, W, C):
    #   out[2i]   = (x[i-1] + x[i]) / 2
    #   out[2i+1] = (x[i-1] + 6 x[i] + x[i+1]) / 8
    even_v = (rows[:-2] + rows[1:-1]) * 0.5
    odd_v = (rows[:-2] + 6.0 * rows[1:-1] + rows[2:]) * 0.125
    v = jnp.stack([even_v, odd_v], axis=1).reshape(2 * tile_h, W, C)

    # horizontal polyphase with replicated edges -> (2*tile_h, 2W, C)
    vp = jnp.concatenate([v[:, :1], v, v[:, -1:]], axis=1)
    even_h = (vp[:, :-2] + vp[:, 1:-1]) * 0.5
    odd_h = (vp[:, :-2] + 6.0 * vp[:, 1:-1] + vp[:, 2:]) * 0.125
    out = jnp.stack([even_h, odd_h], axis=2).reshape(2 * tile_h, 2 * W, C)
    out_ref[...] = out[None].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def smooth_upsample_pallas(x: jax.Array, tile_h: int = 8,
                           interpret: bool = None) -> jax.Array:
    """(N, H, W, C) -> (N, 2H, 2W, C); bit-equivalent to
    ops.resample.smooth_upsample. Requires H % tile_h == 0."""
    n, h, w, c = x.shape
    assert h % tile_h == 0, (h, tile_h)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kern = functools.partial(_kernel, tile_h=tile_h, H=h, W=w, C=c)
    return pl.pallas_call(
        kern,
        grid=(n, h // tile_h),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 2 * tile_h, 2 * w, c),
            lambda ni, i: (ni, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, w, c), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(x)
