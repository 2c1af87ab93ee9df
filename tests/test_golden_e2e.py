"""Golden end-to-end slice — BASELINE.json config 1: IR-50 feature
extraction + cosine verification on the reference's shipped
dummy-test-data images (112x112), our pipeline vs the torch reference at
weight parity."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from stylegan_for_facerec_tpu import nn
from stylegan_for_facerec_tpu.models import irse
from stylegan_for_facerec_tpu.utils import torch_convert as tc
from reference_oracle import ref_import

DATA = "/root/reference/restyle-encoder/dummy-test-data"


@pytest.fixture(scope="module")
def images():
    from PIL import Image
    arrs = []
    for f in sorted(os.listdir(DATA)):
        img = Image.open(os.path.join(DATA, f)).convert("RGB")
        a = np.asarray(img, np.float32) / 255.0
        arrs.append((a - 0.5) / 0.5)
    return np.stack(arrs)          # (8, 112, 112, 3) in [-1, 1]


@pytest.fixture(scope="module")
def model_pair():
    ref_irse = ref_import("backbone.model_irse")
    torch.manual_seed(7)
    tm = ref_irse.IR_50([112, 112])
    tm.eval()
    jm = irse.IR_50(112)
    params, state = tc.from_torch(
        jm, tm.state_dict(), flatten_info={"output_layer.3": (7, 7, 512)})
    return tm, jm, params, state


def test_embedding_parity_on_real_images(images, model_pair):
    tm, jm, params, state = model_pair
    with torch.no_grad():
        want = tm(torch.tensor(
            np.moveaxis(images, -1, 1)).contiguous()).numpy()
    got, _ = jm.apply(params, state, jnp.asarray(images),
                      nn.Ctx(train=False))
    got = np.asarray(got)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)

    # cosine-similarity matrix parity — the verification-relevant quantity
    def cos(e):
        e = e / np.linalg.norm(e, axis=1, keepdims=True)
        return e @ e.T
    np.testing.assert_allclose(cos(got), cos(want), atol=1e-4)


def test_tta_verification_protocol_on_real_images(images, model_pair):
    """The full perform_val protocol (ccrop + flip TTA, sum, L2 norm,
    10-fold sweep) on real face crops; torch side replicated with the
    reference's own ccrop/hflip transforms."""
    from stylegan_for_facerec_tpu.eval import perform_val
    tm, jm, params, state = model_pair

    # build 4 pairs from the 8 images: (0,1),(2,3),(4,5),(6,7)
    issame = np.array([True, False, True, False])
    acc, thr, (tpr, fpr) = perform_val(
        jm, params, state, images, issame, batch_size=8, emb_size=512,
        nrof_folds=2)
    assert 0.0 <= acc <= 1.0
    assert 0.0 <= thr <= 4.0

    # embeddings through our TTA path vs the reference TTA semantics
    # (util/utils.py:199-236: de-norm -> uint8 PIL -> Resize(128,128) ->
    # CenterCrop(112) -> re-norm; flip via PIL) built from PIL directly
    # (torchvision is unavailable; these transforms are PIL underneath)
    from PIL import Image

    def ref_ccrop(img_pm1):
        u8 = np.clip((img_pm1 * 0.5 + 0.5) * 255.0, 0,
                     255).round().astype(np.uint8)
        pil = Image.fromarray(u8).resize((128, 128), Image.BILINEAR)
        arr = np.asarray(pil, np.float32)[8:120, 8:120] / 255.0
        return (arr - 0.5) / 0.5

    cc_np = np.stack([ref_ccrop(im) for im in images])
    fl_np = cc_np[:, :, ::-1].copy()
    with torch.no_grad():
        emb_t = tm(torch.tensor(np.moveaxis(cc_np, -1, 1)).contiguous()) \
            + tm(torch.tensor(np.moveaxis(fl_np, -1, 1)).contiguous())
        emb_t = (emb_t / emb_t.norm(2, dim=1, keepdim=True)).numpy()

    from stylegan_for_facerec_tpu.eval.verify_runner import make_embed_fn
    embed = make_embed_fn(jm, params, state, tta=True, ccrop=True,
                          quantize=True)
    emb_j = np.asarray(embed(jnp.asarray(images)))
    # PIL uint8 round-trips on both sides; small numeric drift allowed
    cos = np.sum(emb_j * emb_t, axis=1)
    assert cos.min() > 0.999, cos
