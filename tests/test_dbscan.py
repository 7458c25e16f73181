import jax
import jax.numpy as jnp
import numpy as np

from gstex_tpu.ops.quat import random_quats
from gstex_tpu.tools.dbscan import (DBSCAN, NOISE, estimate_eps,
                                    make_covariance_3d, save_clustered_ply,
                                    sqrtm_psd_3x3, wasserstein2_sq)


def test_sqrtm():
    key = jax.random.key(0)
    a = jax.random.normal(key, (16, 3, 3))
    psd = a @ a.transpose(0, 2, 1) + 0.1 * jnp.eye(3)
    s = sqrtm_psd_3x3(psd)
    np.testing.assert_allclose(np.asarray(s @ s), np.asarray(psd),
                               rtol=1e-3, atol=1e-4)


def test_w2_identical_is_zero():
    mu = jnp.array([[1.0, 2.0, 3.0]])
    cov = make_covariance_3d(jnp.array([[-2.0, -1.0]]),
                             jnp.array([[1.0, 0, 0, 0.0]]))
    d = wasserstein2_sq(mu, cov, mu, cov)
    assert abs(float(d[0])) < 1e-5


def test_w2_isotropic_analytic():
    # isotropic Gaussians: W2² = ‖Δμ‖² + 3(σ1-σ2)²
    mu1 = jnp.zeros((1, 3))
    mu2 = jnp.array([[1.0, 0, 0]])
    q = jnp.array([[1.0, 0, 0, 0]])
    s1, s2 = -1.0, -2.0
    cov1 = make_covariance_3d(jnp.array([[s1, s1]]), q)
    cov2 = make_covariance_3d(jnp.array([[s2, s2]]), q)
    d = float(wasserstein2_sq(mu1, cov1, mu2, cov2)[0])
    # third axis is ~0 in both → contributes ~(0-0)²; first two axes exact
    expected = 1.0 + 2 * (np.exp(s1) - np.exp(s2)) ** 2
    np.testing.assert_allclose(d, expected, rtol=1e-3)


def test_dbscan_two_blobs(tmp_path):
    rng = np.random.default_rng(0)
    n_half = 60
    blob1 = rng.normal(0, 0.05, (n_half, 3))
    blob2 = rng.normal(0, 0.05, (n_half, 3)) + [5, 0, 0]
    outlier = np.array([[2.5, 2.5, 2.5]])
    means = np.concatenate([blob1, blob2, outlier]).astype(np.float32)
    n = means.shape[0]
    log_scales = np.full((n, 2), -4.0, np.float32)
    quats = np.asarray(random_quats(jax.random.key(1), n))

    eps = estimate_eps(means, log_scales, quats, k=4, percentile=90)
    assert 0 < eps < 2.0
    labels = DBSCAN(eps=max(eps, 0.3), min_pts=5).fit(means, log_scales, quats)
    stats = DBSCAN.cluster_stats(labels)
    assert stats["num_clusters"] == 2
    assert labels[-1] == NOISE
    # each blob is one cluster
    assert len(set(labels[:n_half])) == 1
    assert len(set(labels[n_half:2 * n_half])) == 1
    assert labels[0] != labels[n_half]

    save_clustered_ply(tmp_path / "c.ply", means, labels)
    assert (tmp_path / "c.ply").exists()
