"""Explicit shard_map partial-FC head vs dense single-device math, and
sync-BN under shard_map."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from stylegan_for_facerec_tpu import nn
from stylegan_for_facerec_tpu.losses import cross_entropy_per_sample
from stylegan_for_facerec_tpu.models.heads import arcface_margin
from stylegan_for_facerec_tpu.parallel import make_mesh
from stylegan_for_facerec_tpu.parallel.sharded_head import (
    make_sharded_margin_ce)


@pytest.mark.parametrize("kind", ["arcface", "cosface", "softmax"])
def test_sharded_margin_ce_matches_dense(kind, rng, devices):
    mesh = make_mesh(data=2, model=4)
    B, D, C = 16, 32, 64
    feats = rng.randn(B, D).astype(np.float32) * 3
    weight = rng.randn(C, D).astype(np.float32)
    labels = rng.randint(0, C, B)

    fn = make_sharded_margin_ce(mesh, C, kind=kind)
    with mesh:
        f = jax.device_put(jnp.asarray(feats),
                           NamedSharding(mesh, P("data", None)))
        w = jax.device_put(jnp.asarray(weight),
                           NamedSharding(mesh, P("model", None)))
        l = jax.device_put(jnp.asarray(labels),
                           NamedSharding(mesh, P("data")))
        ce, acc = jax.jit(fn)(f, w, l)

    # dense single-device reference
    fN = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    wN = weight / np.linalg.norm(weight, axis=1, keepdims=True)
    cosine = fN @ wN.T
    one_hot = np.eye(C)[labels]
    if kind == "arcface":
        logits = np.asarray(arcface_margin(jnp.asarray(cosine),
                                           jnp.asarray(one_hot), 64.0, 0.5))
    elif kind == "cosface":
        logits = (one_hot * (cosine - 0.5) + (1 - one_hot) * cosine) * 64.0
    else:
        logits = cosine * 64.0
    want_ce = float(np.mean(np.asarray(cross_entropy_per_sample(
        jnp.asarray(logits), jnp.asarray(labels)))))
    want_acc = float(np.mean(np.argmax(logits, axis=1) == labels))

    np.testing.assert_allclose(float(ce), want_ce, rtol=1e-5)
    np.testing.assert_allclose(float(acc), want_acc, atol=1e-6)


def test_sharded_margin_ce_grads_match(rng, devices):
    mesh = make_mesh(data=2, model=4)
    B, D, C = 8, 16, 32
    feats = jnp.asarray(rng.randn(B, D).astype(np.float32))
    weight = jnp.asarray(rng.randn(C, D).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, C, B))

    fn = make_sharded_margin_ce(mesh, C, kind="arcface")

    def sharded_loss(f, w):
        ce, _ = fn(f, w, labels)
        return ce

    def dense_loss(f, w):
        fN = f / jnp.linalg.norm(f, axis=1, keepdims=True)
        wN = w / jnp.linalg.norm(w, axis=1, keepdims=True)
        cosine = (fN @ wN.T).astype(jnp.float32)
        one_hot = jax.nn.one_hot(labels, C)
        logits = arcface_margin(cosine, one_hot, 64.0, 0.5)
        return jnp.mean(cross_entropy_per_sample(logits, labels))

    with mesh:
        g1 = jax.jit(jax.grad(sharded_loss, argnums=(0, 1)))(feats, weight)
    g2 = jax.grad(dense_loss, argnums=(0, 1))(feats, weight)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-5)


def test_sync_batchnorm_under_shard_map(rng, devices):
    """BatchNorm(sync_axes=('data',)) under shard_map computes GLOBAL batch
    statistics — outputs match a single-device BN over the full batch."""
    mesh = make_mesh(data=8, model=1)
    bn_sync = nn.BatchNorm2d(6, sync_axes=("data",))
    bn_plain = nn.BatchNorm2d(6)
    params, state = bn_plain.init(jax.random.key(0))
    x = rng.randn(16, 4, 4, 6).astype(np.float32)

    def local_apply(x_local):
        y, ns = bn_sync.apply(params, state, x_local, nn.Ctx(train=True))
        return y, ns["mean"], ns["var"]

    with mesh:
        y_sh, mean_sh, var_sh = shard_map(
            local_apply, mesh=mesh,
            in_specs=(P("data", None, None, None),),
            out_specs=(P("data", None, None, None), P(), P()),
            check_vma=False)(jnp.asarray(x))

    y_ref, ns_ref = bn_plain.apply(params, state, jnp.asarray(x),
                                   nn.Ctx(train=True))
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean_sh),
                               np.asarray(ns_ref["mean"]), rtol=1e-5,
                               atol=1e-6)
