"""Backbone zoo parity: MobileFaceNet / ResNet / GhostNet / AttentionNet /
EfficientNet vs the reference torch implementations with converted weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from stylegan_for_facerec_tpu import nn
from stylegan_for_facerec_tpu.models import (attention, efficientnet,
                                             ghostnet, mobilefacenet,
                                             resnet)
from stylegan_for_facerec_tpu.utils import torch_convert as tc
from reference_oracle import ref_import, ref_import_efficientnet


def to_nchw(x):
    return np.moveaxis(np.asarray(x), -1, 1)


def to_nhwc(x):
    return np.moveaxis(np.asarray(x), 1, -1)


def test_mobilefacenet_parity(rng):
    ref = ref_import("backbone.MobileFaceNets")
    torch.manual_seed(0)
    tm = ref.MobileFaceNet(embedding_size=128, out_h=7, out_w=7)
    tm.eval()
    jm = mobilefacenet.MobileFaceNet(embedding_size=128)
    params, state = tc.from_torch(jm, tm.state_dict())
    x = rng.randn(2, 112, 112, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(to_nchw(x)).contiguous()).numpy()
    got, _ = jm.apply(params, state, jnp.asarray(x), nn.Ctx(train=False))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_resnet50_parity(rng):
    ref = ref_import("backbone.model_resnet")
    torch.manual_seed(0)
    tm = ref.ResNet_50([112, 112])
    tm.eval()
    jm = resnet.ResNet_50(112)
    params, state = tc.from_torch(jm, tm.state_dict())
    x = rng.randn(1, 112, 112, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(to_nchw(x)).contiguous()).numpy()
    got, _ = jm.apply(params, state, jnp.asarray(x), nn.Ctx(train=False))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_ghostnet_parity(rng):
    ref = ref_import("backbone.GhostNet")
    torch.manual_seed(0)
    tm = ref.GhostNet(width=1.0, feat_dim=128)
    tm.eval()
    jm = ghostnet.GhostNet(width=1.0, feat_dim=128)
    params, state = tc.from_torch(
        jm, tm.state_dict(), flatten_info={"output_layer.3": (7, 7, 960)})
    x = rng.randn(1, 112, 112, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(to_nchw(x)).contiguous()).numpy()
    got, _ = jm.apply(params, state, jnp.asarray(x), nn.Ctx(train=False))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_attention_module_parity(rng):
    ref = ref_import("backbone.AttentionNets")
    torch.manual_seed(0)
    tm = ref.AttentionModule_stage3(64, 64, size1=(14, 14))
    tm.eval()
    jm = attention.AttentionModule(64, 1)
    params, state = tc.from_torch(jm, tm.state_dict())
    x = rng.randn(1, 14, 14, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(to_nchw(x)).contiguous()).numpy()
    got, _ = jm.apply(params, state, jnp.asarray(x), nn.Ctx(train=False))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), rtol=2e-3,
                               atol=2e-3)


def test_attention_net_shapes(rng):
    jm = attention.AttentionNet_56(feat_dim=64)
    params, state = jm.init(jax.random.key(0))
    x = jnp.asarray(rng.randn(1, 112, 112, 3).astype(np.float32))
    y, _ = jm.apply(params, state, x, nn.Ctx(train=False))
    assert y.shape == (1, 64)


def test_efficientnet_b0_parity(rng):
    """True numerics oracle: the upstream file's corruption is pasted
    non-code TEXT only (reference_oracle.ref_import_efficientnet strips
    it without touching any code), so EfficientNet gets the same
    converted-weights parity check as every other backbone.
    Reference ships it unwired (no constructor call anywhere), so the
    oracle builds it the only way its __init__ allows:
    EfficientNet(out_h, out_w, feat_dim, blocks_args, global_params)
    (EfficientNets.py:770)."""
    ref = ref_import_efficientnet()
    blocks_args, global_params = ref.get_model_params("efficientnet-b0", {})
    torch.manual_seed(0)
    tm = ref.EfficientNet(7, 7, 128, list(blocks_args), global_params)
    tm.eval()
    jm = efficientnet.EfficientNet("b0", feat_dim=128)
    params, state = tc.from_torch(
        jm, tm.state_dict(), flatten_info={"output_layer.3": (7, 7, 1280)})
    x = rng.randn(2, 112, 112, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(to_nchw(x)).contiguous()).numpy()
    got, _ = jm.apply(params, state, jnp.asarray(x), nn.Ctx(train=False))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_efficientnet_b0_forward(rng):
    """Shapes, scaling math, and train/eval forward."""
    jm = efficientnet.EfficientNet("b0", feat_dim=128)
    params, state = jm.init(jax.random.key(0))
    x = jnp.asarray(rng.randn(2, 112, 112, 3).astype(np.float32))
    y, new_state = jm.apply(params, state, x, nn.Ctx(train=False))
    assert y.shape == (2, 128)
    assert np.isfinite(np.asarray(y)).all()
    y2, _ = jm.apply(params, state, x,
                     nn.Ctx(train=True, rng=jax.random.key(1)))
    assert np.isfinite(np.asarray(y2)).all()
    # width/filter rounding matches the published scaling recipe
    assert efficientnet.round_filters(32, 1.0) == 32
    assert efficientnet.round_filters(32, 1.4) == 48   # b4
    assert efficientnet.round_repeats(2, 1.2) == 3
    blocks = jm._scaled_blocks()
    assert len(blocks) == 16                            # b0 block count
