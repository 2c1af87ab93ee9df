"""nn layer numerics vs torch modules (conv/BN/PReLU/pool parity)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from stylegan_for_facerec_tpu import nn


def to_nchw(x):
    return np.moveaxis(np.asarray(x), -1, 1)


def to_nhwc(x):
    return np.moveaxis(np.asarray(x), 1, -1)


def test_conv2d_matches_torch(rng):
    x = rng.randn(2, 9, 9, 4).astype(np.float32)
    layer = nn.Conv2d(4, 8, 3, stride=2, padding=1)
    params, _ = layer.init(jax.random.key(0))

    tconv = tnn.Conv2d(4, 8, 3, stride=2, padding=1)
    with torch.no_grad():
        # HWIO -> OIHW
        tconv.weight.copy_(torch.tensor(
            np.transpose(np.asarray(params["weight"]), (3, 2, 0, 1))))
        tconv.bias.copy_(torch.tensor(np.asarray(params["bias"])))
    want = tconv(torch.tensor(to_nchw(x))).detach().numpy()
    got, _ = layer.apply(params, {}, jnp.asarray(x), nn.Ctx())
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), rtol=1e-4,
                               atol=1e-5)


def test_batchnorm_train_eval_matches_torch(rng):
    x1 = rng.randn(8, 5, 5, 6).astype(np.float32)
    x2 = rng.randn(8, 5, 5, 6).astype(np.float32)
    layer = nn.BatchNorm2d(6)
    params, state = layer.init(jax.random.key(0))
    params = {"weight": jnp.asarray(rng.rand(6).astype(np.float32) + 0.5),
              "bias": jnp.asarray(rng.randn(6).astype(np.float32))}

    tbn = tnn.BatchNorm2d(6)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(np.asarray(params["weight"])))
        tbn.bias.copy_(torch.tensor(np.asarray(params["bias"])))

    # two train steps
    tbn.train()
    w1 = tbn(torch.tensor(to_nchw(x1))).detach().numpy()
    w2 = tbn(torch.tensor(to_nchw(x2))).detach().numpy()
    y1, state = layer.apply(params, state, jnp.asarray(x1), nn.Ctx(train=True))
    y2, state = layer.apply(params, state, jnp.asarray(x2), nn.Ctx(train=True))
    np.testing.assert_allclose(np.asarray(y1), to_nhwc(w1), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(y2), to_nhwc(w2), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(state["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state["var"]),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)

    # eval uses running stats
    tbn.eval()
    we = tbn(torch.tensor(to_nchw(x1))).detach().numpy()
    ye, _ = layer.apply(params, state, jnp.asarray(x1), nn.Ctx(train=False))
    np.testing.assert_allclose(np.asarray(ye), to_nhwc(we), rtol=1e-4,
                               atol=1e-4)


def test_prelu_matches_torch(rng):
    x = rng.randn(2, 3, 3, 4).astype(np.float32)
    layer = nn.PReLU(4)
    params, _ = layer.init(jax.random.key(0))
    tp = tnn.PReLU(4)
    want = tp(torch.tensor(to_nchw(x))).detach().numpy()
    got, _ = layer.apply(params, {}, jnp.asarray(x), nn.Ctx())
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), rtol=1e-6,
                               atol=1e-6)


def test_subsample_is_maxpool1(rng):
    x = rng.randn(1, 8, 8, 2).astype(np.float32)
    want = tnn.MaxPool2d(1, 2)(torch.tensor(to_nchw(x))).numpy()
    got, _ = nn.Subsample(2).apply({}, {}, jnp.asarray(x), nn.Ctx())
    np.testing.assert_array_equal(np.asarray(got), to_nhwc(want))


def test_adaptive_avg_pool(rng):
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    want = tnn.AdaptiveAvgPool2d(7)(torch.tensor(to_nchw(x))).numpy()
    got, _ = nn.AdaptiveAvgPool2d(7).apply({}, {}, jnp.asarray(x), nn.Ctx())
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), rtol=1e-5,
                               atol=1e-6)
    want2 = tnn.AdaptiveAvgPool2d(8)(torch.tensor(to_nchw(x))).numpy()
    got2, _ = nn.AdaptiveAvgPool2d(8).apply({}, {}, jnp.asarray(x), nn.Ctx())
    np.testing.assert_allclose(np.asarray(got2), to_nhwc(want2), rtol=1e-5,
                               atol=1e-6)


def test_dropout_train_eval():
    x = jnp.ones((4, 100))
    d = nn.Dropout(0.5)
    y_eval, _ = d.apply({}, {}, x, nn.Ctx(train=False))
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(x))
    y_tr, _ = d.apply({}, {}, x, nn.Ctx(train=True, rng=jax.random.key(0)))
    arr = np.asarray(y_tr)
    assert set(np.unique(arr)).issubset({0.0, 2.0})
    assert 0.3 < (arr == 0).mean() < 0.7


def test_sequential_threads_state(rng):
    seq = nn.Sequential(nn.Conv2d(3, 8, 3, padding=1), nn.BatchNorm2d(8),
                        nn.PReLU(8))
    params, state = seq.init(jax.random.key(1))
    x = jnp.asarray(rng.randn(2, 6, 6, 3).astype(np.float32))
    y, new_state = seq.apply(params, state, x, nn.Ctx(train=True))
    assert y.shape == (2, 6, 6, 8)
    assert "1" in new_state and "mean" in new_state["1"]
    assert not np.allclose(np.asarray(new_state["1"]["mean"]),
                           np.asarray(state["1"]["mean"]))


def test_linear_matches_torch(rng):
    x = rng.randn(3, 10).astype(np.float32)
    layer = nn.Linear(10, 7)
    params, _ = layer.init(jax.random.key(0))
    tl = tnn.Linear(10, 7)
    with torch.no_grad():
        tl.weight.copy_(torch.tensor(np.asarray(params["weight"]).T))
        tl.bias.copy_(torch.tensor(np.asarray(params["bias"])))
    want = tl(torch.tensor(x)).detach().numpy()
    got, _ = layer.apply(params, {}, jnp.asarray(x), nn.Ctx())
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_ctx_replace_propagates_bn_groups():
    """Ctx.replace must carry bn_groups: dropping it silently switched
    ghost BN to whole-batch statistics in any derived context."""
    from stylegan_for_facerec_tpu import nn
    ctx = nn.Ctx(train=True, rng=jax.random.key(0), bn_groups=8)
    assert ctx.replace(train=False).bn_groups == 8
    assert ctx.replace(bn_groups=2).bn_groups == 2


def test_mapping_truncation_requires_w_avg():
    """truncation_psi != 1 without a tracked w_avg must raise (reference
    generator.py:284-288), not silently lerp toward zeros."""
    import pytest
    from stylegan_for_facerec_tpu.models.stylegan2_ada import MappingNetwork
    m = MappingNetwork(z_dim=16, w_dim=16, num_layers=2, num_ws=4,
                       w_avg_beta=None)
    params, state = m.init(jax.random.key(0))
    z = jnp.zeros((2, 16))
    with pytest.raises(ValueError, match="w_avg"):
        m.apply(params, state, z, nn.Ctx(train=False), truncation_psi=0.7)
