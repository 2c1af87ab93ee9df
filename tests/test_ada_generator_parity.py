"""StyleGAN2-ADA generator: golden-output parity against the reference torch
implementation (/root/reference/backbone/stylegan2_ada/generator.py) with
converted weights and const noise."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from stylegan_for_facerec_tpu import nn
from stylegan_for_facerec_tpu.models import stylegan2_ada as ada
from stylegan_for_facerec_tpu.utils import torch_convert as tc
from reference_oracle import ref_import


@pytest.fixture(scope="module")
def ref_gen_mod():
    return ref_import("backbone.stylegan2_ada.generator")


@pytest.fixture(scope="module")
def ref_utils_mod():
    return ref_import("backbone.stylegan2_ada.utils")


def test_fully_connected_parity(ref_utils_mod, rng):
    tm = ref_utils_mod.FullyConnectedLayer(16, 24, activation="lrelu",
                                           lr_multiplier=0.01)
    x = rng.randn(4, 16).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()
    jm = ada.FullyConnectedLayer(16, 24, activation="lrelu",
                                 lr_multiplier=0.01)
    params, _ = tc.from_torch(jm, tm.state_dict())
    got, _ = jm.apply(params, {}, jnp.asarray(x), nn.Ctx())
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_normalize_2nd_moment(ref_utils_mod, rng):
    x = rng.randn(4, 16).astype(np.float32)
    want = ref_utils_mod.normalize_2nd_moment(torch.tensor(x)).numpy()
    got = np.asarray(ada.normalize_2nd_moment(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def gen_pair(ref_gen_mod):
    torch.manual_seed(0)
    tm = ref_gen_mod.Generator(z_dim=64, w_dim=64, w_num_layers=2,
                               img_resolution=32, img_channels=3)
    tm.eval()
    jm = ada.Generator(z_dim=64, w_dim=64, w_num_layers=2,
                       img_resolution=32, img_channels=3)
    params, state = tc.from_torch(jm, tm.state_dict())
    return tm, jm, params, state


def test_mapping_parity(gen_pair, rng):
    tm, jm, params, state = gen_pair
    z = rng.randn(4, 64).astype(np.float32)
    with torch.no_grad():
        want = tm.mapping(torch.tensor(z)).numpy()
    mapping = jm._children()["mapping"]
    got, _ = mapping.apply(params["mapping"], state["mapping"],
                           jnp.asarray(z), nn.Ctx(train=False))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_synthesis_parity_const_noise(gen_pair, rng):
    tm, jm, params, state = gen_pair
    num_ws = tm.num_ws
    ws = rng.randn(2, num_ws, 64).astype(np.float32)
    with torch.no_grad():
        want = tm.synthesis(torch.tensor(ws), noise_mode="const")[0].numpy()
    synth = jm._children()["synthesis"]
    got, _ = synth.apply(params["synthesis"], state["synthesis"],
                         jnp.asarray(ws), nn.Ctx(train=False),
                         noise_mode="const")
    np.testing.assert_allclose(np.asarray(got),
                               np.moveaxis(want, 1, -1), rtol=2e-3,
                               atol=2e-3)


def test_generator_end_to_end_const_noise(gen_pair, rng):
    tm, jm, params, state = gen_pair
    z = rng.randn(2, 64).astype(np.float32)
    with torch.no_grad():
        # forward with randomize_noise falsy -> noise_mode 'const'
        want, _ = tm(torch.tensor(z))
    img, _ = jm.apply(params, state, jnp.asarray(z), nn.Ctx(train=False),
                      noise_mode="const")
    np.testing.assert_allclose(np.asarray(img),
                               np.moveaxis(want.numpy(), 1, -1),
                               rtol=2e-3, atol=2e-3)


def test_w_avg_ema_updates_in_train(gen_pair, rng):
    tm, jm, params, state = gen_pair
    mapping = jm._children()["mapping"]
    z = jnp.asarray(rng.randn(8, 64).astype(np.float32))
    _, new_ms = mapping.apply(params["mapping"], state["mapping"], z,
                              nn.Ctx(train=True))
    assert not np.allclose(np.asarray(new_ms["w_avg"]),
                           np.asarray(state["mapping"]["w_avg"]))
    # matches the torch lerp(mean, w_avg, beta) update
    tmap = tm.mapping
    tmap.train()
    with torch.no_grad():
        tmap(torch.tensor(np.asarray(z)))
    np.testing.assert_allclose(np.asarray(new_ms["w_avg"]),
                               tmap.w_avg.numpy(), rtol=1e-4, atol=1e-5)


def test_truncation(gen_pair, rng):
    tm, jm, params, state = gen_pair
    tm.eval()  # the EMA test above leaves the torch mapping in train mode
    # set a non-zero w_avg on both sides
    w_avg = rng.randn(64).astype(np.float32)
    tm.mapping.w_avg.copy_(torch.tensor(w_avg))
    state = dict(state)
    state["mapping"] = dict(state["mapping"])
    state["mapping"]["w_avg"] = jnp.asarray(w_avg)
    z = rng.randn(2, 64).astype(np.float32)
    with torch.no_grad():
        want = tm.mapping(torch.tensor(z), truncation_psi=0.7).numpy()
    mapping = jm._children()["mapping"]
    got, _ = mapping.apply(params["mapping"], state["mapping"],
                           jnp.asarray(z), nn.Ctx(train=False),
                           truncation_psi=0.7)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_stylegan1_variant_parity(ref_gen_mod, rng):
    """The generator's StyleGAN1 layer family (generator.py:208-305):
    plain equalized convs + AdaIN instead of modulated convs."""
    torch.manual_seed(3)
    tm = ref_gen_mod.Generator(z_dim=64, w_dim=64, w_num_layers=2,
                               img_resolution=32, img_channels=3,
                               synthesis_layer="stylegan1")
    tm.eval()
    jm = ada.Generator(z_dim=64, w_dim=64, w_num_layers=2,
                       img_resolution=32, img_channels=3,
                       synthesis_layer="stylegan1")
    params, state = tc.from_torch(jm, tm.state_dict())
    z = rng.randn(2, 64).astype(np.float32)
    with torch.no_grad():
        want, _ = tm(torch.tensor(z))
    img, _ = jm.apply(params, state, jnp.asarray(z), nn.Ctx(train=False),
                      noise_mode="const")
    np.testing.assert_allclose(np.asarray(img),
                               np.moveaxis(want.numpy(), 1, -1),
                               rtol=3e-3, atol=3e-3)
