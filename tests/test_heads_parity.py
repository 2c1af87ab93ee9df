"""Margin heads vs the reference torch implementations
(/root/reference/head/metrics.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from stylegan_for_facerec_tpu import nn
from stylegan_for_facerec_tpu.models import heads
from stylegan_for_facerec_tpu.utils import torch_convert as tc
from reference_oracle import ref_import


@pytest.fixture(scope="module")
def ref_heads():
    return ref_import("head.metrics")


def _data(rng, n=8, d=32, c=20):
    feats = rng.randn(n, d).astype(np.float32)
    labels = rng.randint(0, c, size=n).astype(np.int64)
    return feats, labels


def test_arcface_parity(ref_heads, rng):
    feats, labels = _data(rng)
    th = ref_heads.ArcFace(32, 20, device_id=None, s=64.0, m=0.5)
    # reference builds one_hot on 'cuda' unless onehot_vec is passed
    # (head/metrics.py:130-134); CPU oracle needs the explicit vector
    one_hot = torch.zeros(8, 20).scatter_(
        1, torch.tensor(labels).view(-1, 1), 1)
    with torch.no_grad():
        want = th(torch.tensor(feats), torch.tensor(labels), one_hot).numpy()

    jh = heads.ArcFace(32, 20)
    params = tc.head_params_from_torch(th.state_dict())
    got, _ = jh.apply(params, {}, (jnp.asarray(feats), jnp.asarray(labels)),
                      nn.Ctx())
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_cosface_parity(ref_heads, rng):
    feats, labels = _data(rng)
    th = ref_heads.CosFace(32, 20, device_id=None)
    with torch.no_grad():
        want = th(torch.tensor(feats), torch.tensor(labels)).numpy()
    jh = heads.CosFace(32, 20)
    params = tc.head_params_from_torch(th.state_dict())
    got, _ = jh.apply(params, {}, (jnp.asarray(feats), jnp.asarray(labels)),
                      nn.Ctx())
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_sphereface_parity(ref_heads, rng):
    feats, labels = _data(rng)
    th = ref_heads.SphereFace(32, 20, device_id=None, m=4)
    with torch.no_grad():
        want1 = th(torch.tensor(feats), torch.tensor(labels)).numpy()
        want2 = th(torch.tensor(feats), torch.tensor(labels)).numpy()
    jh = heads.SphereFace(32, 20, m=4)
    params = tc.head_params_from_torch(th.state_dict())
    state = {"iter": jnp.zeros((), jnp.int32)}
    got1, state = jh.apply(params, state,
                           (jnp.asarray(feats), jnp.asarray(labels)),
                           nn.Ctx())
    got2, state = jh.apply(params, state,
                           (jnp.asarray(feats), jnp.asarray(labels)),
                           nn.Ctx())
    # iteration counter (lambda annealing) must march identically
    np.testing.assert_allclose(np.asarray(got1), want1, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got2), want2, rtol=1e-4, atol=1e-4)
    assert int(state["iter"]) == 2


def test_am_softmax_parity(ref_heads, rng):
    feats, labels = _data(rng)
    th = ref_heads.Am_softmax(32, 20, device_id=None)
    with torch.no_grad():
        want = th(torch.tensor(feats), torch.tensor(labels)).numpy()
    jh = heads.AmSoftmax(32, 20)
    params = tc.head_params_from_torch(th.state_dict())
    got, _ = jh.apply(params, {}, (jnp.asarray(feats), jnp.asarray(labels)),
                      nn.Ctx())
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_softmax_head_parity(ref_heads, rng):
    feats, labels = _data(rng)
    th = ref_heads.Softmax(32, 20, device_id=None)
    with torch.no_grad():
        want = th(torch.tensor(feats)).numpy()
    jh = heads.SoftmaxHead(32, 20)
    params = tc.head_params_from_torch(th.state_dict())
    got, _ = jh.apply(params, {}, (jnp.asarray(feats), jnp.asarray(labels)),
                      nn.Ctx())
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_build_head_registry():
    for name in ("Softmax", "ArcFace", "CosFace", "SphereFace",
                 "Am_softmax"):
        h = heads.build_head(name, 512, 1000)
        p, s = h.init(jax.random.key(0))
        assert p


def test_curricularface_parity_and_grads(ref_heads, rng):
    """Forward, t-EMA, AND input-gradient parity vs head/metrics.py:475-510.
    The gradient check catches the ADVICE r1 bug: the reference updates t
    under torch.no_grad(), so no gradient may flow through the EMA."""
    feats, labels = _data(rng)
    th = ref_heads.CurricularFace(32, 20, m=0.5, s=64.0)
    jh = heads.CurricularFace(32, 20, s=64.0, m=0.5)
    params = {"weight": jnp.asarray(th.kernel.detach().numpy().T)}
    state = {"t": jnp.zeros(())}

    tf = torch.tensor(feats, requires_grad=True)
    out_t = th(tf, torch.tensor(labels))
    out_j, new_state = jh.apply(
        params, state, (jnp.asarray(feats), jnp.asarray(labels)),
        nn.Ctx(train=True))
    np.testing.assert_allclose(np.asarray(out_j), out_t.detach().numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(new_state["t"]), float(th.t),
                               rtol=1e-5, atol=1e-7)

    out_t.sum().backward()

    def total(f):
        o, _ = jh.apply(params, state, (f, jnp.asarray(labels)),
                        nn.Ctx(train=True))
        return jnp.sum(o)

    g_j = jax.grad(total)(jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(g_j), tf.grad.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_adacos_adaptive_scale_parity(ref_heads, rng):
    """AdaCos recomputes its scale from batch stats every forward
    (head/metrics.py:362-368) and the returned logits use the NEW scale.
    Run 3 steps on different batches so the carried-state update is
    actually exercised (step 2+ depends on step 1's scale via B_avg)."""
    th = ref_heads.AdaCos(32, 20)
    jh = heads.AdaCos(32, 20)
    params = {"weight": jnp.asarray(th.W.detach().numpy())}
    _, state = jh.init(jax.random.key(0))
    np.testing.assert_allclose(float(state["scale"]), float(th.scale),
                               rtol=1e-6)

    for step in range(3):
        feats, labels = _data(rng)
        with torch.no_grad():
            want = th(torch.tensor(feats), torch.tensor(labels)).numpy()
        got, state = jh.apply(
            params, state, (jnp.asarray(feats), jnp.asarray(labels)),
            nn.Ctx(train=True))
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(float(state["scale"]), float(th.scale),
                                   rtol=1e-5, atol=1e-6)


def test_adacos_scale_carries_no_gradient(rng):
    """The scale update happens under no_grad in the reference; gradients
    w.r.t. features must not flow through the B_avg/theta_med statistic."""
    feats, labels = _data(rng)
    jh = heads.AdaCos(32, 20)
    params, state = jh.init(jax.random.key(1))

    def loss(f):
        out, _ = jh.apply(params, state, (f, jnp.asarray(labels)), nn.Ctx())
        return jnp.sum(out)

    g = jax.grad(loss)(jnp.asarray(feats))
    assert np.isfinite(np.asarray(g)).all()
