"""Classification losses for stage 3.

``focal_loss`` reproduces the reference ``FocalLoss``
(``/root/reference/loss/focal.py:9-21``) exactly — including its quirk of
applying the focal transform to the MEAN cross-entropy (``self.ce`` is
``nn.CrossEntropyLoss`` with default mean reduction), not per-sample:

    logp = mean_CE(logits, labels); p = exp(-logp); loss = (1-p)^g * logp

``focal_loss_per_sample`` is the textbook per-sample variant, provided as an
opt-in.

All log-softmax math runs in f32 regardless of logits dtype (bf16-safe) and
is written as global math over possibly class-sharded logits — XLA inserts
the cross-shard psum/pmax for the reductions when logits carry a
('data','model') sharding (see parallel/mesh.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_per_sample(logits: jax.Array, labels: jax.Array)\
        -> jax.Array:
    """Numerically-stable CE with integer labels; returns (B,)."""
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    target = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return lse - target


def focal_loss(logits: jax.Array, labels: jax.Array,
               gamma: float = 2.0) -> jax.Array:
    """Reference semantics (mean CE then focal transform)."""
    logp = jnp.mean(cross_entropy_per_sample(logits, labels))
    p = jnp.exp(-logp)
    return (1.0 - p) ** gamma * logp


def focal_loss_per_sample(logits: jax.Array, labels: jax.Array,
                          gamma: float = 2.0) -> jax.Array:
    ce = cross_entropy_per_sample(logits, labels)
    p = jnp.exp(-ce)
    return jnp.mean((1.0 - p) ** gamma * ce)


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return jnp.mean(cross_entropy_per_sample(logits, labels))


def topk_accuracy(logits: jax.Array, labels: jax.Array, k: int = 1)\
        -> jax.Array:
    """``util/utils.py:343-358`` accuracy; returns fraction in [0, 1].
    k is clamped to the class count (tiny-class-count debug runs)."""
    k = min(k, logits.shape[-1])
    _, idx = jax.lax.top_k(logits, k)
    hit = jnp.any(idx == labels[:, None], axis=-1)
    return jnp.mean(hit.astype(jnp.float32))
