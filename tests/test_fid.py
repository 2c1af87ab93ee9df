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
