"""Weight initializers matching the reference's torch init semantics.

The reference initializes every conv/linear with
``nn.init.xavier_uniform_`` (``/root/reference/backbone/model_irse.py:174-189``)
and BN scale=1 / bias=0. Fan computations here follow torch's convention so a
freshly-initialized network is distributed identically to the reference.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _fans(shape, layout: str):
    """fan_in/fan_out for a weight of the given layout.

    layouts: 'io' dense (in, out); 'oi' dense (out, in);
    'hwio' conv (kh, kw, in, out).
    """
    if layout == "io":
        return shape[0], shape[1]
    if layout == "oi":
        return shape[1], shape[0]
    if layout == "hwio":
        rf = int(np.prod(shape[:-2]))
        return shape[-2] * rf, shape[-1] * rf
    raise ValueError(layout)


def xavier_uniform(key, shape, layout="hwio", dtype=jnp.float32, gain=1.0):
    fan_in, fan_out = _fans(shape, layout)
    a = gain * float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, -a, a)


def normal(key, shape, std=1.0, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * std


def kaiming_uniform(key, shape, layout="hwio", a=5 ** 0.5, dtype=jnp.float32):
    """torch's default conv/linear init (kaiming_uniform with a=sqrt(5))."""
    fan_in, _ = _fans(shape, layout)
    gain = float(np.sqrt(2.0 / (1 + a * a)))
    bound = gain * float(np.sqrt(3.0 / fan_in))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def uniform_fanin_bias(key, shape, fan_in, dtype=jnp.float32):
    """torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / float(np.sqrt(fan_in)) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)
