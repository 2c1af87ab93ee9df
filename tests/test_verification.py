"""Verification metrics parity vs the reference facenet-lineage code."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_for_facerec_tpu import nn
from stylegan_for_facerec_tpu.eval import (evaluate, perform_val,
                                           verification)
from reference_oracle import ref_import


@pytest.fixture(scope="module")
def ref_verif():
    return ref_import("util.verification")


def _fake_embeddings(rng, n_pairs=600, dim=64):
    """Pairs with controllable separability: same-pairs close, diff far."""
    issame = rng.rand(n_pairs) > 0.5
    base = rng.randn(n_pairs, dim)
    noise_scale = np.where(issame, 0.3, 1.6)[:, None]
    e1 = base + 0.05 * rng.randn(n_pairs, dim)
    e2 = base + noise_scale * rng.randn(n_pairs, dim)
    e1 /= np.linalg.norm(e1, axis=1, keepdims=True)
    e2 /= np.linalg.norm(e2, axis=1, keepdims=True)
    emb = np.empty((2 * n_pairs, dim))
    emb[0::2] = e1
    emb[1::2] = e2
    return emb.astype(np.float32), issame


def test_kfold_matches_sklearn():
    from sklearn.model_selection import KFold
    for n in (600, 601, 607):
        ours = verification.kfold_indices(n, 10)
        skl = list(KFold(n_splits=10, shuffle=False).split(np.arange(n)))
        for (otr, ote), (str_, ste) in zip(ours, skl):
            np.testing.assert_array_equal(otr, str_)
            np.testing.assert_array_equal(ote, ste)


def test_evaluate_matches_reference(ref_verif, rng):
    emb, issame = _fake_embeddings(rng)
    tpr_r, fpr_r, acc_r, best_r = ref_verif.evaluate(emb, issame, 10)
    tpr_o, fpr_o, acc_o, best_o = evaluate(emb, issame, 10)
    np.testing.assert_allclose(acc_o, acc_r, atol=1e-12)
    np.testing.assert_allclose(best_o, best_r, atol=1e-12)
    np.testing.assert_allclose(tpr_o, tpr_r, atol=1e-12)
    np.testing.assert_allclose(fpr_o, fpr_r, atol=1e-12)


def test_calculate_val_sane(rng):
    """calculate_val is dead code in the reference eval path and its scipy
    slinear call crashes on modern scipy (duplicate FAR plateau values);
    ours uses np.interp — check FAR tracks the target and VAL is high for
    separable data."""
    emb, issame = _fake_embeddings(rng)
    thr = np.arange(0, 4, 0.01)
    val, val_std, far = verification.calculate_val(
        thr, emb[0::2], emb[1::2], issame, 1e-2)
    assert 0.0 <= far <= 0.05
    assert val > 0.3


def test_perform_val_end_to_end(rng):
    """Tiny backbone + synthetic carray: identical images -> same-pair
    distances 0 -> accuracy should separate perfectly."""
    from stylegan_for_facerec_tpu.models import irse

    class Tiny(irse.Backbone):
        def _children(self):
            ch = super()._children()
            ch["body"] = nn.Sequential(
                irse.BottleneckIR(64, 512, 16, se=False))
            return ch

    m = Tiny(input_size=112, emb_size=32)
    params, state = m.init(jax.random.key(0))

    n_pairs = 40
    imgs = []
    issame = []
    for i in range(n_pairs):
        a = rng.rand(112, 112, 3).astype(np.float32) * 2 - 1
        if i % 2 == 0:
            b = a.copy()          # same pair
            issame.append(True)
        else:
            b = rng.rand(112, 112, 3).astype(np.float32) * 2 - 1
            issame.append(False)
        imgs += [a, b]
    carray = np.stack(imgs)
    acc, best_thr, (tpr, fpr) = perform_val(
        m, params, state, carray, np.asarray(issame), batch_size=16,
        emb_size=32)
    assert acc > 0.95   # identical pairs are trivially verifiable
    assert 0 <= best_thr <= 4


def test_perform_val_accepts_nchw(rng):
    from stylegan_for_facerec_tpu.eval.verify_runner import (
        compute_embeddings)
    calls = []

    def fake_embed(x):
        calls.append(x.shape)
        return jnp.ones((x.shape[0], 8))

    arr = rng.rand(10, 3, 112, 112).astype(np.float32)
    out = compute_embeddings(fake_embed, arr, batch_size=4, emb_size=8)
    assert out.shape == (10, 8)
    assert all(s == (4, 112, 112, 3) for s in calls)


def test_calculate_roc_pca_matches_reference(ref_verif, rng):
    emb, issame = _fake_embeddings(rng, n_pairs=120, dim=32)
    thr = np.arange(0, 4, 0.05)
    want = ref_verif.calculate_roc(thr, emb[0::2], emb[1::2],
                                   np.asarray(issame), nrof_folds=5, pca=8)
    got = verification.calculate_roc(thr, emb[0::2], emb[1::2], issame,
                                     nrof_folds=5, pca=8)
    np.testing.assert_allclose(got[2], want[2], atol=1e-10)  # accuracy
    np.testing.assert_allclose(got[3], want[3], atol=1e-10)  # thresholds
