"""Rosinality-lineage StyleGAN2 generator/discriminator parity vs the
reference torch model (/root/reference/backbone/stylegan2/model.py) run with
a pure-torch op stub on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from stylegan_for_facerec_tpu import nn
from stylegan_for_facerec_tpu.models import stylegan2 as sg2
from stylegan_for_facerec_tpu.utils import torch_convert as tc
from reference_oracle import ref_import


def to_nhwc(x):
    return np.moveaxis(np.asarray(x), 1, -1)


@pytest.fixture(scope="module")
def ref_model():
    return ref_import("backbone.stylegan2.model")


def test_equal_linear_parity(ref_model, rng):
    tm = ref_model.EqualLinear(16, 24, lr_mul=0.01, activation="fused_lrelu")
    jm = sg2.EqualLinear(16, 24, lr_mul=0.01, activation="fused_lrelu")
    params, _ = tc.from_torch(jm, tm.state_dict())
    x = rng.randn(4, 16).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()
    got, _ = jm.apply(params, {}, jnp.asarray(x), nn.Ctx())
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("upsample,downsample", [(False, False),
                                                 (True, False),
                                                 (False, True)])
def test_modulated_conv_parity(ref_model, upsample, downsample, rng):
    torch.manual_seed(1)
    tm = ref_model.ModulatedConv2d(8, 12, 3, 16, upsample=upsample,
                                   downsample=downsample)
    jm = sg2.ModulatedConv2d(8, 12, 3, 16, upsample=upsample,
                             downsample=downsample)
    params, _ = tc.from_torch(jm, tm.state_dict())
    x = rng.randn(2, 8, 8, 8).astype(np.float32)
    s = rng.randn(2, 16).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(np.moveaxis(x, -1, 1)).contiguous(),
                  torch.tensor(s)).numpy()
    got, _ = jm.apply(params, {}, (jnp.asarray(x), jnp.asarray(s)), nn.Ctx())
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), rtol=2e-4,
                               atol=2e-4)


@pytest.fixture(scope="module")
def g_pair(ref_model):
    torch.manual_seed(0)
    tm = ref_model.Generator(size=32, style_dim=64, n_mlp=2)
    tm.eval()
    jm = sg2.Generator(size=32, style_dim=64, n_mlp=2)
    params, state = tc.from_torch(jm, tm.state_dict())
    return tm, jm, params, state


def test_generator_parity_const_noise(g_pair, rng):
    tm, jm, params, state = g_pair
    z = rng.randn(2, 64).astype(np.float32)
    with torch.no_grad():
        want, _ = tm([torch.tensor(z)], randomize_noise=False)
    got, _ = jm.apply(params, state, [jnp.asarray(z)], nn.Ctx(train=False),
                      randomize_noise=False)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want.numpy()),
                               rtol=3e-3, atol=3e-3)


def test_generator_style_mixing(g_pair, rng):
    tm, jm, params, state = g_pair
    z1 = rng.randn(2, 64).astype(np.float32)
    z2 = rng.randn(2, 64).astype(np.float32)
    with torch.no_grad():
        want, _ = tm([torch.tensor(z1), torch.tensor(z2)],
                     randomize_noise=False, inject_index=3)
    got, _ = jm.apply(params, state, [jnp.asarray(z1), jnp.asarray(z2)],
                      nn.Ctx(train=False), randomize_noise=False,
                      inject_index=3)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want.numpy()),
                               rtol=3e-3, atol=3e-3)


def test_generator_truncation_latent_input(g_pair, rng):
    tm, jm, params, state = g_pair
    z = rng.randn(2, 64).astype(np.float32)
    with torch.no_grad():
        t_lat = tm.mean_latent(256)
        want, _ = tm([torch.tensor(z)], randomize_noise=False,
                     truncation=0.5, truncation_latent=t_lat)
    j_lat = jnp.asarray(t_lat.numpy())
    got, _ = jm.apply(params, state, [jnp.asarray(z)], nn.Ctx(train=False),
                      randomize_noise=False, truncation=0.5,
                      truncation_latent=j_lat)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want.numpy()),
                               rtol=3e-3, atol=3e-3)


def test_discriminator_parity(ref_model, rng):
    torch.manual_seed(2)
    tm = ref_model.Discriminator(size=32)
    tm.eval()
    jm = sg2.Discriminator(size=32)
    params, _ = tc.from_torch(jm, tm.state_dict())
    x = rng.randn(8, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(np.moveaxis(x, -1, 1)).contiguous()).numpy()
    got, _ = jm.apply(params, {}, jnp.asarray(x), nn.Ctx())
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-3, atol=3e-3)


def test_discriminator_grad_flows(ref_model, rng):
    jm = sg2.Discriminator(size=32)
    params, _ = jm.init(jax.random.key(0))
    x = jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32))

    def loss(p, x):
        y, _ = jm.apply(p, {}, x, nn.Ctx())
        return jnp.mean(jax.nn.softplus(-y))

    g = jax.grad(loss)(params, x)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_generator_style_mixing_random_crossover(g_pair, rng):
    """With inject_index=None and an rng in the context, the crossover
    point is sampled per call (model.py:512-513); different keys must be
    able to produce different mixes, and no rng falls back to the fixed
    midpoint deterministically."""
    tm, jm, params, state = g_pair
    z1 = rng.randn(2, 64).astype(np.float32)
    z2 = rng.randn(2, 64).astype(np.float32)
    styles = [jnp.asarray(z1), jnp.asarray(z2)]
    outs = []
    for seed in range(6):
        got, _ = jm.apply(params, state, styles,
                          nn.Ctx(train=True, rng=jax.random.key(seed)),
                          randomize_noise=False)
        outs.append(np.asarray(got))
    assert any(not np.allclose(outs[0], o) for o in outs[1:]), \
        "crossover never varied across 6 rng keys"
    # deterministic fallback without rng
    a, _ = jm.apply(params, state, styles, nn.Ctx(train=False),
                    randomize_noise=False)
    b, _ = jm.apply(params, state, styles, nn.Ctx(train=False),
                    randomize_noise=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
