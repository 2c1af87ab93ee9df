"""Extra margin-head parity vs the reference torch implementations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from stylegan_for_facerec_tpu import nn
from stylegan_for_facerec_tpu.models import heads_extra as hx
from reference_oracle import cuda_noop, ref_import


@pytest.fixture(scope="module")
def ref_heads():
    return ref_import("head.metrics")


def _data(rng, n=8, d=32, c=20, feat_scale=20.0):
    feats = (rng.randn(n, d) * feat_scale / np.sqrt(d)).astype(np.float32)
    labels = rng.randint(0, c, size=n).astype(np.int64)
    return feats, labels


def _pair(ref_cls, jm, torch_kw=None, rng=None, w_key="weight"):
    torch.manual_seed(0)
    th = ref_cls(32, 20, **(torch_kw or {}))
    params = {k: jnp.asarray(v.detach().numpy())
              for k, v in th.state_dict().items()}
    return th, params


def test_am_softmax_v2_parity(ref_heads, rng):
    th, params = _pair(ref_heads.AM_Softmax, None)
    jh = hx.AMSoftmaxV2(32, 20)
    feats, labels = _data(rng)
    with torch.no_grad():
        want = th(torch.tensor(feats), torch.tensor(labels)).numpy()
    got, _ = jh.apply(params, {}, (jnp.asarray(feats), jnp.asarray(labels)),
                      nn.Ctx())
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_arcnegface_parity(ref_heads, rng):
    th, params = _pair(ref_heads.ArcNegFace, None)
    jh = hx.ArcNegFace(32, 20)
    feats, labels = _data(rng)
    with torch.no_grad():
        want = th(torch.tensor(feats), torch.tensor(labels)).numpy()
    got, _ = jh.apply(params, {}, (jnp.asarray(feats), jnp.asarray(labels)),
                      nn.Ctx())
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


def test_circleloss_parity(ref_heads, rng):
    th, params = _pair(ref_heads.CircleLoss, None)
    jh = hx.CircleLoss(32, 20)
    feats, labels = _data(rng)
    with torch.no_grad():
        want = th(torch.tensor(feats), torch.tensor(labels)).numpy()
    got, _ = jh.apply(params, {}, (jnp.asarray(feats), jnp.asarray(labels)),
                      nn.Ctx())
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_magface_parity(ref_heads, rng):
    th, params = _pair(ref_heads.MagFace, None)
    jh = hx.MagFace(32, 20)
    feats, labels = _data(rng)
    with torch.no_grad():
        want, want_g = th(torch.tensor(feats), torch.tensor(labels))
    (got, got_g), _ = jh.apply(params, {},
                               (jnp.asarray(feats), jnp.asarray(labels)),
                               nn.Ctx())
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_g), want_g.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("is_am", [False, True])
def test_mv_softmax_parity(ref_heads, is_am, rng):
    th, params = _pair(ref_heads.MV_Softmax, None, {"is_am": is_am})
    jh = hx.MVSoftmax(32, 20, is_am=is_am)
    feats, labels = _data(rng)
    with torch.no_grad():
        want = th(torch.tensor(feats), torch.tensor(labels)).numpy()
    got, _ = jh.apply(params, {}, (jnp.asarray(feats), jnp.asarray(labels)),
                      nn.Ctx())
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_npcface_parity(ref_heads, rng):
    """True-numerics oracle: the reference NPCFace hardcodes .cuda() in
    forward (metrics.py:622); cuda_noop() patches the device move to a
    no-op so its real math runs on CPU torch. Two distinct batches to
    exercise both branches of the hard-mask average (VERDICT r3 next #5)."""
    th, params = _pair(ref_heads.NPCFace, None)
    jh = hx.NPCFace(32, 20)
    for seed in (0, 1):
        r = np.random.RandomState(seed)
        feats, labels = _data(r)
        with cuda_noop(), torch.no_grad():
            want = th(torch.tensor(feats), torch.tensor(labels)).numpy()
        got, _ = jh.apply(params, {},
                          (jnp.asarray(feats), jnp.asarray(labels)),
                          nn.Ctx())
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                                   atol=1e-4)


def test_npcface_semantics(rng):
    """Margin semantics sanity (kept alongside the oracle test): target
    column gets the cooperative margin, hard negatives get t*cos+a."""
    jh = hx.NPCFace(32, 20)
    params, _ = jh.init(jax.random.key(0))
    feats, labels = _data(rng)
    got, _ = jh.apply(params, {}, (jnp.asarray(feats), jnp.asarray(labels)),
                      nn.Ctx())
    got = np.asarray(got) / jh.scale
    fn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    kn = np.asarray(params["kernel"])
    kn = kn / np.linalg.norm(kn, axis=0, keepdims=True)
    cos = np.clip(fn @ kn, -1, 1)
    # non-target entries are either untouched (<= cos_t_m) or t*cos + a
    for i in range(8):
        for j in range(20):
            if j == labels[i]:
                continue
            v = got[i, j]
            assert (abs(v - cos[i, j]) < 1e-5
                    or abs(v - (1.10 * cos[i, j] + 0.20)) < 1e-5)


def test_sst_prototype_queue(rng):
    jh = hx.SSTPrototype(feat_dim=16, queue_size=64, scale=30.0,
                         loss_type="am_softmax", margin=0.2)
    params, state = jh.init(jax.random.key(0))
    p1 = jnp.asarray(rng.randn(8, 16).astype(np.float32))
    g2 = jnp.asarray(rng.randn(8, 16).astype(np.float32))
    p2 = jnp.asarray(rng.randn(8, 16).astype(np.float32))
    g1 = jnp.asarray(rng.randn(8, 16).astype(np.float32))
    ids = jnp.arange(8)
    ctx = nn.Ctx(train=True, rng=jax.random.key(1))
    (o1, o2, label), state = jh.apply(params, state, (p1, g2, p2, g1, ids),
                                      ctx)
    assert o1.shape == (8, 64) and o2.shape == (8, 64)
    np.testing.assert_array_equal(np.asarray(label), np.arange(8))
    assert int(state["index"]) == 8
    assert np.asarray(state["labels"])[:8].tolist() == list(range(8))
    # next call starts at index 8
    (o1, o2, label), state = jh.apply(params, state, (p1, g2, p2, g1, ids),
                                      ctx)
    np.testing.assert_array_equal(np.asarray(label), np.arange(8) + 8)


def test_sst_prototype_queue_wraparound(rng):
    """queue_size NOT divisible by the batch: written columns and the
    positive labels must stay in sync by wrapping (the torch reference's
    slice assignment would raise here, metrics.py:677; a clamped
    dynamic_update_slice silently desynchronized them)."""
    jh = hx.SSTPrototype(feat_dim=16, queue_size=10, scale=30.0,
                         loss_type="am_softmax", margin=0.2)
    params, state = jh.init(jax.random.key(0))
    ctx = nn.Ctx(train=True, rng=jax.random.key(1))

    def batch(seed):
        r = np.random.RandomState(seed)
        return tuple(jnp.asarray(r.randn(4, 16).astype(np.float32))
                     for _ in range(4)) + (jnp.arange(4) + 10 * seed,)

    (o1, _, label), state = jh.apply(params, state, batch(1), ctx)
    (o1, _, label), state = jh.apply(params, state, batch(2), ctx)
    # third batch wraps: index 8 -> columns 8, 9, 0, 1
    (o1, _, label), state = jh.apply(params, state, batch(3), ctx)
    np.testing.assert_array_equal(np.asarray(label), [8, 9, 0, 1])
    assert int(state["index"]) == 2
    # wrapped labels landed at the wrapped columns
    labs = np.asarray(state["labels"])
    np.testing.assert_array_equal(labs[[8, 9, 0, 1]], [30, 31, 32, 33])
    # positive logit rows hit real (margined) columns: gt was not zero
    gt = np.asarray(o1)[np.arange(4), np.asarray(label)]
    assert np.all(np.abs(gt) > 0)
