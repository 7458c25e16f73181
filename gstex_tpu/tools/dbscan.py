"""DBSCAN clustering of Gaussian primitives under the 2-Wasserstein metric.

The jnp-native counterpart of the reference's standalone ``dbscan_clustering/``
tool (``dbscan.py:162-191``, ``dbscan_ballquery.py:131-171``): squared
2-Wasserstein distance between 3D Gaussians
``‖μ1−μ2‖² + tr(Σ1+Σ2−2(Σ2^½ Σ1 Σ2^½)^½)`` with a closed eigh-based PSD
sqrt, k-distance eps estimation, and DBSCAN fit. Neighbor queries are
brute-force chunked (accelerator-friendly) instead of the reference's
octree/pytorch3d ball query; the cluster expansion is a standard BFS on
host over chunk-computed neighbor masks.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.quat import quat_to_rotmat

NOISE = -1
UNVISITED = -2


def make_covariance_3d(log_scales: jax.Array, quats: jax.Array) -> jax.Array:
    """(N,2|3) GS log-scales + (N,4) quats -> (N,3,3) covariances.

    Follows the GS convention of the reference (``dbscan_ballquery.py:
    143-152``): first two axes exp(log_scale) clamped, third tied to
    ``1e-5·mean`` of the first two.
    """
    s = jnp.maximum(jnp.exp(log_scales[..., :2]), 1e-9)
    s3 = 1e-5 * jnp.mean(s, axis=-1, keepdims=True)
    scale = jnp.concatenate([s, s3], axis=-1)
    R = quat_to_rotmat(quats)
    return jnp.einsum("...ij,...j,...kj->...ik", R, scale * scale, R)


def sqrtm_psd_3x3(mat: jax.Array, eps: float = 1e-12) -> jax.Array:
    e, v = jnp.linalg.eigh(mat)
    se = jnp.sqrt(jnp.maximum(e, eps))
    return jnp.einsum("...ij,...j,...kj->...ik", v, se, v)


def wasserstein2_sq(mu1, cov1, mu2, cov2) -> jax.Array:
    """Squared 2-Wasserstein distance; broadcasts over leading dims."""
    mean_term = jnp.sum((mu1 - mu2) ** 2, axis=-1)
    sqrt2 = sqrtm_psd_3x3(cov2)
    inner = sqrt2 @ cov1 @ jnp.swapaxes(sqrt2, -1, -2)
    cross = sqrtm_psd_3x3(inner)
    tr = jnp.trace(cov1 + cov2 - 2.0 * cross, axis1=-2, axis2=-1)
    return mean_term + tr


@jax.jit
def _dist_block(mu_q, cov_q, mu_all, cov_all):
    return wasserstein2_sq(mu_q[:, None], cov_q[:, None],
                           mu_all[None], cov_all[None])


def pairwise_w2(means, log_scales, quats, query_idx=None, chunk=256):
    """Chunked (Q, N) squared-W2 distance matrix as numpy."""
    cov = make_covariance_3d(log_scales, quats)
    mu = jnp.asarray(means)
    qi = np.arange(mu.shape[0]) if query_idx is None else np.asarray(query_idx)
    rows = []
    for i in range(0, len(qi), chunk):
        sel = jnp.asarray(qi[i:i + chunk])
        rows.append(np.asarray(_dist_block(mu[sel], cov[sel], mu, cov)))
    return np.concatenate(rows, 0)


def estimate_eps(means, log_scales, quats, k: int = 4,
                 percentile: float = 90.0, sample: int = 2048,
                 seed: int = 0) -> float:
    """k-distance eps heuristic (``dbscan_ballquery.py:194`` analog):
    percentile of the k-th-NN W2 distance over a sample."""
    n = means.shape[0]
    rng = np.random.default_rng(seed)
    idx = rng.choice(n, size=min(sample, n), replace=False)
    d = pairwise_w2(means, log_scales, quats, query_idx=idx)
    d_sorted = np.sort(d, axis=1)
    kth = np.sqrt(np.maximum(d_sorted[:, min(k, n - 1)], 0.0))
    return float(np.percentile(kth, percentile))


class DBSCAN:
    """Classic DBSCAN over Gaussian primitives (``dbscan.py:191-380`` analog).

    fit() returns labels (N,): cluster id ≥ 0 or NOISE (-1).
    """

    def __init__(self, eps: float, min_pts: int, chunk: int = 512):
        self.eps = eps
        self.min_pts = min_pts
        self.chunk = chunk

    def fit(self, means, log_scales, quats) -> np.ndarray:
        n = means.shape[0]
        cov = make_covariance_3d(log_scales, quats)
        mu = jnp.asarray(means)
        eps_sq = self.eps * self.eps

        def neighbors_of(idx_arr: np.ndarray) -> list[np.ndarray]:
            out = []
            for i in range(0, len(idx_arr), self.chunk):
                sel = jnp.asarray(idx_arr[i:i + self.chunk])
                d = np.asarray(_dist_block(mu[sel], cov[sel], mu, cov))
                for row in d:
                    out.append(np.nonzero(row <= eps_sq)[0])
            return out

        # core-point detection in bulk
        counts = np.zeros(n, np.int64)
        for i in range(0, n, self.chunk):
            sel = jnp.asarray(np.arange(i, min(i + self.chunk, n)))
            d = np.asarray(_dist_block(mu[sel], cov[sel], mu, cov))
            counts[i:i + d.shape[0]] = (d <= eps_sq).sum(1)
        core = counts >= self.min_pts

        labels = np.full(n, UNVISITED, np.int64)
        cluster = 0
        for seed_pt in range(n):
            if labels[seed_pt] != UNVISITED or not core[seed_pt]:
                continue
            labels[seed_pt] = cluster
            frontier = np.array([seed_pt])
            while frontier.size:
                neigh_lists = neighbors_of(frontier)
                nxt = []
                for nb in neigh_lists:
                    fresh = nb[(labels[nb] == UNVISITED)
                               | (labels[nb] == NOISE)]
                    newly_core = fresh[(labels[fresh] == UNVISITED)
                                       & core[fresh]]
                    labels[fresh] = cluster
                    nxt.append(newly_core)
                frontier = np.unique(np.concatenate(nxt)) if nxt else np.array([], np.int64)
            cluster += 1
        labels[labels == UNVISITED] = NOISE
        return labels

    @staticmethod
    def cluster_stats(labels: np.ndarray) -> dict:
        """Cluster analysis summary (``dbscan_ballquery.py:484`` analog)."""
        ids, counts = np.unique(labels[labels >= 0], return_counts=True)
        return {
            "num_clusters": int(len(ids)),
            "num_noise": int((labels == NOISE).sum()),
            "sizes": dict(zip(ids.tolist(), counts.tolist())),
        }


def save_clustered_ply(path, means, labels, seed: int = 0):
    """Write a ply colored by cluster id (``demo_ballquery_dbscan.py:96``)."""
    from ..utils.ply import write_ply

    rng = np.random.default_rng(seed)
    palette = rng.uniform(50, 255, size=(max(labels.max() + 1, 1), 3))
    cols = np.where(labels[:, None] >= 0,
                    palette[np.maximum(labels, 0)], 30.0)
    write_ply(path, {
        "x": np.asarray(means[:, 0]), "y": np.asarray(means[:, 1]),
        "z": np.asarray(means[:, 2]),
        "red": cols[:, 0], "green": cols[:, 1], "blue": cols[:, 2],
    })
