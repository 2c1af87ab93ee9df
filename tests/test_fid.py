"""eval/fid.py: Frechet distance math + embedding_fid plumbing."""

import numpy as np
import pytest

from stylegan_for_facerec_tpu.eval import fid


def _spd(rng, d):
    a = rng.randn(d, d)
    return a @ a.T / d + np.eye(d) * 0.1


def test_fid_of_identical_stats_is_zero(rng):
    x = rng.randn(500, 16)
    mu, cov = fid.gaussian_stats(x)
    assert fid.frechet_distance(mu, cov, mu, cov) == pytest.approx(
        0.0, abs=1e-8)


def test_fid_pure_mean_shift_is_squared_distance(rng):
    """Equal covariances: d^2 reduces to |mu1 - mu2|^2 exactly."""
    mu = rng.randn(8)
    cov = _spd(rng, 8)
    shift = rng.randn(8)
    got = fid.frechet_distance(mu, cov, mu + shift, cov)
    assert got == pytest.approx(float(np.sum(shift ** 2)), rel=1e-6)


def test_fid_matches_scipy_sqrtm_form(rng):
    """Cross-check the symmetric-sqrtm form against scipy's sqrtm of the
    plain product c1 @ c2 (equal in exact arithmetic)."""
    scipy_linalg = pytest.importorskip("scipy.linalg")
    mu1, mu2 = rng.randn(12), rng.randn(12)
    c1, c2 = _spd(rng, 12), _spd(rng, 12)
    want = (np.sum((mu1 - mu2) ** 2) + np.trace(c1) + np.trace(c2)
            - 2.0 * np.trace(np.real(scipy_linalg.sqrtm(c1 @ c2))))
    got = fid.frechet_distance(mu1, c1, mu2, c2)
    assert got == pytest.approx(float(want), rel=1e-6)


def test_fid_scale_mismatch_positive(rng):
    mu = rng.randn(6)
    cov = _spd(rng, 6)
    d = fid.frechet_distance(mu, cov, mu, cov * 4.0)
    # 1-D intuition per eigendirection: (sigma - 2 sigma)^2 = sigma^2 > 0
    assert d > 0.1


def test_gaussian_stats_shapes_and_validation(rng):
    mu, cov = fid.gaussian_stats(rng.randn(64, 8))
    assert mu.shape == (8,) and cov.shape == (8, 8)
    np.testing.assert_allclose(cov, cov.T)
    with pytest.raises(ValueError):
        fid.gaussian_stats(rng.randn(1, 8))
    with pytest.raises(ValueError):
        fid.gaussian_stats(rng.randn(8))


def test_embedding_fid_ragged_batches_and_direction(rng):
    """identity embed_fn: same cloud ~0; shifted cloud ~|shift|^2. The
    170/64 sizes force a ragged final chunk through the batching path."""
    real = rng.randn(170, 5).astype(np.float32)
    fake_same = real + rng.randn(170, 5).astype(np.float32) * 1e-3
    fake_far = real + 3.0

    def embed(x):
        return x  # identity feature space

    near = fid.embedding_fid(embed, real, fake_same, batch_size=64)
    far = fid.embedding_fid(embed, real, fake_far, batch_size=64)
    assert near < 0.01
    assert far == pytest.approx(5 * 9.0, rel=0.05)  # D * shift^2
    assert near < far


def test_inception_v3_stand_in_conversion_and_fid(rng):
    """Real-Inception FID readiness (VERDICT r3 next #6): the jax
    InceptionV3 mirrors the torchvision/pytorch-fid state_dict schema, so
    a (random-init) torch-style checkpoint stand-in converts through the
    standard from_torch key walk, the pool3 forward produces 2048-d
    features, and embedding_fid in that space behaves like a divergence.
    Numerical parity vs torchvision needs its weights (offline-
    unreachable); the wiring is what is testable and pinned here."""
    import jax
    import jax.numpy as jnp
    from stylegan_for_facerec_tpu import nn
    from stylegan_for_facerec_tpu.models.inception import InceptionV3
    from stylegan_for_facerec_tpu.utils import torch_convert as tc

    m = InceptionV3()
    params, state = m.init(jax.random.key(0))
    # the "checkpoint": torch key schema incl. the classifier heads the
    # real files carry (the CLI strips them; strict from_torch must
    # consume every remaining key)
    sd = tc.to_torch(m, params, state)
    assert "Conv2d_1a_3x3.conv.weight" in sd
    assert "Mixed_7c.branch_pool.bn.running_var" in sd
    assert sd["Conv2d_1a_3x3.conv.weight"].shape == (32, 3, 3, 3)
    p2, s2 = tc.from_torch(m, sd)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    @jax.jit
    def embed(x):
        y, _ = m.apply(p2, s2, x, nn.Ctx(train=False))
        return y

    # resize_input handles arbitrary sizes; keep it small for CPU
    a = jnp.asarray(rng.randn(4, 64, 64, 3).clip(-1, 1), jnp.float32)
    feats = np.asarray(embed(a))
    assert feats.shape == (4, 2048)
    assert np.isfinite(feats).all()
    same = fid.embedding_fid(embed, np.asarray(a), np.asarray(a),
                             batch_size=4)
    shifted = fid.embedding_fid(
        embed, np.asarray(a),
        np.asarray(jnp.clip(a + 0.5, -1, 1)), batch_size=4)
    assert same == pytest.approx(0.0, abs=1e-3)
    assert shifted > same
