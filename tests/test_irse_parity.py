"""IR/IR-SE backbone: golden-output parity against the reference torch
implementation (/root/reference/backbone/model_irse.py) through the weight
converter."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from stylegan_for_facerec_tpu import nn
from stylegan_for_facerec_tpu.models import irse
from stylegan_for_facerec_tpu.utils import torch_convert as tc
from reference_oracle import ref_import


def to_nchw(x):
    return np.moveaxis(np.asarray(x), -1, 1)


@pytest.fixture(scope="module")
def ref_irse():
    return ref_import("backbone.model_irse")


def _small_backbone_pair(ref_irse, mode):
    """The full IR-50 is slow on CPU; parity on a truncated body exercises
    every layer type (conv, BN, PReLU, SE, both shortcut kinds, output
    head). We build the reference Backbone and trim its body."""
    tm = ref_irse.Backbone([112, 112], 50, mode)
    tm.body = torch.nn.Sequential(*list(tm.body.children())[:4])
    tm.eval()

    # matching jax definition: blocks 0-3 of IR-50 = 3x (64,64) + 1x (64,128)
    class Trimmed(irse.Backbone):
        def _children(self):
            ch = super()._children()
            blocks = irse.get_blocks(50)[:4]
            se = self.mode == "ir_se"
            ch["body"] = nn.Sequential(
                *[irse.BottleneckIR(i, d, s, se=se) for i, d, s in blocks])
            return ch
    jm = Trimmed(112, 50, mode)
    return tm, jm


@pytest.mark.parametrize("mode", ["ir", "ir_se"])
def test_backbone_parity(ref_irse, mode, rng):
    tm, jm = _small_backbone_pair(ref_irse, mode)
    sd = tm.state_dict()
    params, state = tc.from_torch(jm, sd)
    # trimmed body ends at 128ch, 56x56 -> the 512-ch output head cannot
    # apply; compare input_layer+body features instead
    x = rng.randn(2, 112, 112, 3).astype(np.float32)
    with torch.no_grad():
        want = tm.body(tm.input_layer(torch.tensor(to_nchw(x))))
    got, _ = jm.features(params, state, jnp.asarray(x), nn.Ctx(train=False))
    np.testing.assert_allclose(np.asarray(got),
                               np.moveaxis(want.numpy(), 1, -1),
                               rtol=1e-3, atol=1e-3)


def test_output_layer_flatten_permutation(ref_irse, rng):
    """The BN->Dropout->Flatten->Linear->BN head: checks the converter's
    (C,H,W)->(H,W,C) flatten permutation on the Linear."""
    tm = ref_irse.Backbone([112, 112], 50, "ir")
    tm.eval()
    jm = irse.IR_50(112)
    params, state = tc.from_torch(
        jm, tm.state_dict(), flatten_info={"output_layer.3": (7, 7, 512)})
    feat = rng.randn(2, 7, 7, 512).astype(np.float32)
    with torch.no_grad():
        want = tm.output_layer(torch.tensor(to_nchw(feat)).contiguous())
    out_layer = jm._children()["output_layer"]
    got, _ = out_layer.apply(params["output_layer"], state["output_layer"],
                             jnp.asarray(feat), nn.Ctx(train=False))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-3,
                               atol=1e-3)


def test_full_ir50_embedding_parity(ref_irse, rng):
    """End-to-end 112x112 -> 512-d embedding parity (BASELINE config 1
    shape), eval mode, single small batch to keep CPU time sane."""
    tm = ref_irse.IR_50([112, 112])
    tm.eval()
    jm = irse.IR_50(112)
    params, state = tc.from_torch(
        jm, tm.state_dict(), flatten_info={"output_layer.3": (7, 7, 512)})
    x = rng.randn(1, 112, 112, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(to_nchw(x))).numpy()
    got, _ = jm.apply(params, state, jnp.asarray(x), nn.Ctx(train=False))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_roundtrip_export_to_torch(ref_irse, rng):
    """jax -> torch export (to_torch) loads cleanly into the reference
    model and reproduces our embeddings."""
    jm = irse.IR_50(112)
    params, state = jm.init(jax.random.key(5))
    sd = tc.to_torch(jm, params, state,
                     flatten_info={"output_layer.3": (7, 7, 512)})
    tm = ref_irse.IR_50([112, 112])
    missing = tm.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=True)
    tm.eval()
    x = rng.randn(1, 112, 112, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(to_nchw(x)).contiguous()).numpy()
    got, _ = jm.apply(params, state, jnp.asarray(x), nn.Ctx(train=False))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
