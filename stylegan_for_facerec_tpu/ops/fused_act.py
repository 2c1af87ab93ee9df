"""Fused bias + LeakyReLU + gain + clamp.

Replaces the reference CUDA kernel
``/root/reference/backbone/stylegan2/op/fused_bias_act_kernel.cu`` (bias add +
LeakyReLU(0.2) + sqrt(2) gain) and the ADA-path activation
``clamp_gain(act(x + b), gain, clamp)``
(``/root/reference/backbone/stylegan2_ada/utils.py:6-7,117``).

TPU-first note: on TPU the *right* default is plain jnp — XLA fuses this
elementwise chain into the producing conv/matmul, so a hand-written kernel
only forces an extra HBM round trip. A Pallas VPU kernel (with custom VJP)
is provided anyway for the standalone case and as the perf-parity twin of
the CUDA op; enable with ``use_pallas=True`` (requires the trailing channel
dim to be a multiple of 128).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_SQRT2 = math.sqrt(2.0)


def fused_leaky_relu(x: jax.Array, bias: Optional[jax.Array] = None,
                     negative_slope: float = 0.2,
                     scale: float = _SQRT2) -> jax.Array:
    """Rosinality-path semantics (``op/fused_act.py:72-85``): bias broadcast
    over the channel axis (last in NHWC), LeakyReLU, constant gain."""
    if bias is not None:
        x = x + bias.astype(x.dtype)
    return jnp.where(x >= 0, x, negative_slope * x) * jnp.asarray(
        scale, x.dtype)


def clamp_gain(x: jax.Array, gain: float, clamp: float) -> jax.Array:
    """``/root/reference/backbone/stylegan2_ada/utils.py:6-7``."""
    return jnp.clip(x * jnp.asarray(gain, x.dtype), -clamp, clamp)


def bias_act(x: jax.Array, bias: Optional[jax.Array] = None,
             act: str = "lrelu", gain: float = 1.0,
             clamp: Optional[float] = None) -> jax.Array:
    """ADA-path activation: ``clamp_gain(act(x + b), act_gain * gain,
    256 * gain)`` with act_gain = sqrt(2) for lrelu, 1 for linear
    (``stylegan2_ada/utils.py:22-31``, usage ``generator.py:205``)."""
    if bias is not None:
        x = x + bias.astype(x.dtype)
    if act == "lrelu":
        x = jnp.where(x >= 0, x, 0.2 * x)
        act_gain = _SQRT2
    elif act == "linear":
        act_gain = 1.0
    else:
        raise ValueError(act)
    g = act_gain * gain
    if clamp is not None:
        return jnp.clip(x * jnp.asarray(g, x.dtype), -clamp * gain,
                        clamp * gain)
    return x * jnp.asarray(g, x.dtype) if g != 1.0 else x


# ---------------------------------------------------------------------------
# Pallas kernel path (standalone fused op with custom VJP)
# ---------------------------------------------------------------------------

def _fba_kernel(x_ref, b_ref, o_ref, *, slope, gain, clamp):
    x = x_ref[...] + b_ref[...]
    y = jnp.where(x >= 0, x, slope * x) * gain
    if clamp is not None:
        y = jnp.clip(y, -clamp, clamp)
    o_ref[...] = y


def _fba_grad_kernel(x_ref, b_ref, g_ref, o_ref, *, slope, gain, clamp):
    x = x_ref[...] + b_ref[...]
    y = jnp.where(x >= 0, x, slope * x) * gain
    d = jnp.where(x >= 0, gain, slope * gain)
    if clamp is not None:
        d = jnp.where(jnp.abs(y) < clamp, d, 0.0)
    o_ref[...] = g_ref[...] * d


def _interpret() -> bool:
    # Pallas compiles only on TPU; CPU (the 8-device test mesh) interprets.
    return jax.default_backend() == "cpu"


def _run_rowwise(kernel, args, shape, dtype, block_rows=256):
    rows, cols = shape
    grid = (pl.cdiv(rows, block_rows),)
    specs = [pl.BlockSpec((block_rows, cols), lambda i: (i, 0))
             for _ in args]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((block_rows, cols), lambda i: (i, 0)),
        interpret=_interpret(),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_bias_act_pallas(x: jax.Array, bias: jax.Array,
                          negative_slope: float = 0.2,
                          gain: float = _SQRT2,
                          clamp: Optional[float] = None) -> jax.Array:
    """Pallas twin of the CUDA ``fused_bias_act`` (forward mode 30 / grad
    mode 31 in ``fused_bias_act_kernel.cu:36-45``). x: (..., C); bias: (C,)."""
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    b2 = jnp.broadcast_to(bias.astype(x.dtype), x2.shape)
    kern = functools.partial(_fba_kernel, slope=negative_slope, gain=gain,
                             clamp=clamp)
    y = _run_rowwise(kern, (x2, b2), x2.shape, x.dtype)
    return y.reshape(shape)


def _fba_fwd(x, bias, negative_slope, gain, clamp):
    y = fused_bias_act_pallas(x, bias, negative_slope, gain, clamp)
    return y, (x, bias)


def _fba_bwd(negative_slope, gain, clamp, res, g):
    x, bias = res
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    b2 = jnp.broadcast_to(bias.astype(x.dtype), x2.shape)
    g2 = g.reshape(-1, c)
    kern = functools.partial(_fba_grad_kernel, slope=negative_slope,
                             gain=gain, clamp=clamp)
    dx = _run_rowwise(kern, (x2, b2, g2), x2.shape, x.dtype)
    dx = dx.reshape(x.shape)
    # grad wrt bias: sum over all non-channel dims, as the reference wrapper
    # does (``op/fused_act.py:31-36``)
    db = dx.sum(axis=tuple(range(x.ndim - 1))).astype(bias.dtype)
    return dx, db


fused_bias_act_pallas.defvjp(_fba_fwd, _fba_bwd)
