"""Frechet distance between embedding distributions — stage-1 GAN quality.

The reference delegates stage-1 training to stylegan2-ada-lightning
(``/root/reference/README.md:118-123``), whose validation loop reports
FID on InceptionV3 features. Inception weights are not available offline
in this image, so the TPU-native stage-1 trainer reports the same
statistic on 512-d face-embedding features (IR-SE-50) instead: with a
converted reference checkpoint this is a domain-relevant "face FID";
with random init it remains a valid two-sample divergence for RELATIVE
progress tracking within one run (the CLI warns which one you get).

The Frechet math runs on host float64 (a 512x512 eigendecomposition is
microseconds on CPU and f32 TPU eigh would dominate the metric's noise
floor); only the embedding forward runs on device.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np
import jax.numpy as jnp


def gaussian_stats(feats) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mu (D,), cov (D, D)) in float64."""
    x = np.asarray(feats, np.float64)
    if x.ndim != 2 or x.shape[0] < 2:
        raise ValueError(f"need (N>=2, D) features, got {x.shape}")
    mu = x.mean(axis=0)
    xc = x - mu
    cov = xc.T @ xc / (x.shape[0] - 1)
    return mu, cov


def _sqrtm_psd(a: np.ndarray) -> np.ndarray:
    """Symmetric PSD square root via eigendecomposition."""
    w, v = np.linalg.eigh(a)
    w = np.clip(w, 0.0, None)
    return (v * np.sqrt(w)) @ v.T


def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    """d^2 = |mu1-mu2|^2 + tr(c1 + c2 - 2 (c1^1/2 c2 c1^1/2)^1/2).

    The symmetric form avoids sqrtm of the non-symmetric product c1@c2
    (scipy.linalg.sqrtm's complex drift); both are equal in exact
    arithmetic.
    """
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    cov1, cov2 = np.asarray(cov1, np.float64), np.asarray(cov2, np.float64)
    s1 = _sqrtm_psd(cov1)
    inner = s1 @ cov2 @ s1
    # eigvalsh of the symmetrized inner product; clip tiny negatives
    ev = np.clip(np.linalg.eigvalsh((inner + inner.T) / 2.0), 0.0, None)
    tr_sqrt = float(np.sqrt(ev).sum())
    d2 = (float(np.sum((mu1 - mu2) ** 2))
          + float(np.trace(cov1)) + float(np.trace(cov2)) - 2.0 * tr_sqrt)
    return max(d2, 0.0)


def embedding_fid(embed_fn: Callable, real_images, fake_images,
                  batch_size: int = 64) -> float:
    """FID between two image sets in ``embed_fn``'s feature space.

    ``embed_fn(images_nhwc) -> (B, D)`` runs on device; images are fed in
    ``batch_size`` chunks (ragged tail included) and features gathered to
    host float64 for the Frechet math.
    """
    def feats(images):
        out = []
        n = images.shape[0]
        for i in range(0, n, batch_size):
            out.append(np.asarray(embed_fn(jnp.asarray(
                images[i: i + batch_size]))))
        return np.concatenate(out, axis=0)

    mu_r, cov_r = gaussian_stats(feats(real_images))
    mu_f, cov_f = gaussian_stats(feats(fake_images))
    return frechet_distance(mu_r, cov_r, mu_f, cov_f)
