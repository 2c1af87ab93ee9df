"""GAC demographic modules, inference utils, observability."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from stylegan_for_facerec_tpu import nn
from stylegan_for_facerec_tpu.models import gac
from reference_oracle import ref_import


def to_nchw(x):
    return np.moveaxis(np.asarray(x), -1, 1)


def test_adaconv_faster_parity(rng):
    """vs backbone/restyle_psp_helpers.AdaConv2d_faster (incl. its
    group-0/1-share-kernel quirk)."""
    helpers = ref_import("backbone.restyle_psp_helpers")
    torch.manual_seed(0)
    tm = helpers.AdaConv2d_faster(4, 8, 12, 3, stride=1, padding=1,
                                  adap=True)
    jm = gac.AdaConv2dFaster(4, 8, 12, 3, stride=1, padding=1, adap=True)
    params = {
        "kernel_base": jnp.asarray(np.transpose(
            tm.kernel_base.detach().numpy(), (2, 3, 1, 0))),
        "kernel_mask": jnp.asarray(np.transpose(
            tm.kernel_mask.detach().numpy(), (0, 2, 3, 1))[..., None]),
    }
    x = rng.randn(8, 10, 10, 8).astype(np.float32)
    labels = rng.randint(0, 4, 8)
    with torch.no_grad():
        want = tm(torch.tensor(to_nchw(x)).contiguous(),
                  torch.tensor(labels)).numpy()
    got, _ = jm.apply(params, {}, (jnp.asarray(x), jnp.asarray(labels)),
                      nn.Ctx())
    np.testing.assert_allclose(np.asarray(got),
                               np.moveaxis(want, 1, -1), rtol=1e-3,
                               atol=1e-4)


def test_attblock_parity(rng):
    helpers = ref_import("backbone.restyle_psp_helpers")
    torch.manual_seed(0)
    tm = helpers.AttBlock(8, ndemog=4, init_strategy="ones")
    jm = gac.AttBlock(8, ndemog=4, init_strategy="ones")
    params = {"att_channel": jnp.asarray(tm.att_channel.detach().numpy())}
    x = rng.randn(6, 5, 5, 8).astype(np.float32)
    labels = rng.randint(0, 4, 6)
    with torch.no_grad():
        want = tm(torch.tensor(to_nchw(x)).contiguous(),
                  torch.tensor(labels)).numpy()
    got, _ = jm.apply(params, {}, (jnp.asarray(x), jnp.asarray(labels)),
                      nn.Ctx())
    np.testing.assert_allclose(np.asarray(got), np.moveaxis(want, 1, -1),
                               rtol=1e-5, atol=1e-6)


def test_conv2d_extended_shapes(rng):
    jm = gac.Conv2dExtended(4, 8, 16, 3, padding=1)
    params, _ = jm.init(jax.random.key(0))
    x = jnp.asarray(rng.randn(3, 8, 8, 8).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, 3))
    y, _ = jm.apply(params, {}, (x, labels), nn.Ctx())
    assert y.shape == (3, 8, 8, 16)


def test_gac_resnet_forward(rng):
    m = gac.gac_resnet18(ndemog=4, n_styles=3, adap=True, use_att=True)
    params, state = m.init(jax.random.key(0))
    x = jnp.asarray(rng.randn(2, 112, 112, 6).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, 2))
    w, _ = m.apply(params, state, (x, labels), nn.Ctx(train=False))
    assert w.shape == (2, 3, 512)
    assert np.isfinite(np.asarray(w)).all()


def test_run_on_batch(rng):
    from stylegan_for_facerec_tpu.eval.inference import run_on_batch
    from stylegan_for_facerec_tpu.models.psp import PSp
    m = PSp(output_size=32)
    params, state = m.init(jax.random.key(0))
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    avg = jnp.zeros((32, 32, 3))
    outs, lats = run_on_batch(m, params, state, x, avg, n_iters=2,
                              resize_outputs=False)
    assert outs.shape[0] == 2 and lats.shape[0] == 2
    assert not np.allclose(np.asarray(lats[0]), np.asarray(lats[1]))


def test_tensor2im_and_grid(rng):
    from stylegan_for_facerec_tpu.eval.inference import face_grid, tensor2im
    img = jnp.asarray(rng.rand(8, 8, 3) * 2 - 1)
    arr = tensor2im(img)
    assert arr.dtype == np.uint8 and arr.shape == (8, 8, 3)
    grid = face_grid([{"input_face": img, "target_face": img,
                       "output_face": [img, img]}])
    assert grid.shape == (8, 32, 3)


def test_metric_logger(tmp_path):
    from stylegan_for_facerec_tpu.utils.logging import (AverageMeter,
                                                        MetricLogger,
                                                        aggregate_loss_dicts)
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
    agg = aggregate_loss_dicts([{"a": 1.0}, {"a": 3.0, "b": 2.0}])
    assert agg["a"] == 2.0 and agg["b"] == 2.0
    logger = MetricLogger(log_dir=str(tmp_path))
    logger.log(1, {"loss": 0.5})
    logger.log_benchmark(2, "rfw_African", 0.9, 1.2, epoch=1)
    logger.close()
    lines = open(tmp_path / "metrics.jsonl").read().splitlines()
    assert len(lines) == 2


def test_adaconv_per_group_masks_independent():
    """Each demographic group draws an INDEPENDENT adaptive kernel at init
    (restyle_psp_helpers.py:259-266 repeats BEFORE xavier_normal_); a
    tiled init would leave every group's adaptation bit-identical."""
    from stylegan_for_facerec_tpu.models.gac import AdaConv2dFaster
    layer = AdaConv2dFaster(ndemog=4, ic=8, oc=8, ks=3, adap=True)
    params, _ = layer.init(jax.random.key(0))
    mask = np.asarray(params["kernel_mask"])
    assert mask.shape[0] == 4
    for g in range(1, 4):
        assert not np.allclose(mask[0], mask[g]), f"group {g} == group 0"
