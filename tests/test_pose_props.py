"""Property-based tests for pose preprocessing (VERDICT r1 weak-item 6).

``data/pose_utils.py`` follows the reference algorithm closely
(``camera_utils.py:456-630``); these tests pin the SEMANTIC contract with
implementation-independent properties so the module could be rewritten
from scratch and still be checked: rigidity of the transform, the
centering/orientation invariants each mode promises, and equivariance
under rigid pre-transforms.
"""

import numpy as np
import pytest

from gstex_tpu.data.pose_utils import (auto_orient_and_center_poses,
                                       focus_of_attention,
                                       rotation_matrix_between)


def _rand_rot(rng):
    q = rng.normal(size=4)
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _look_at_poses(rng, m, target):
    """OpenGL-convention c2w poses looking at ``target``."""
    poses = []
    for _ in range(m):
        eye = target + rng.normal(size=3) * 2.0 + np.array([0, 0, 3.0])
        f = target - eye
        f = f / np.linalg.norm(f)
        side = np.cross(f, np.array([0.0, 1.0, 0.0]))
        side /= np.linalg.norm(side)
        up = np.cross(side, f)
        m4 = np.eye(4)
        m4[:3, 0], m4[:3, 1], m4[:3, 2], m4[:3, 3] = side, up, -f, eye
        poses.append(m4)
    return np.stack(poses)


def _is_rotation(r, tol=1e-8):
    return (np.allclose(r @ r.T, np.eye(3), atol=tol)
            and abs(np.linalg.det(r) - 1.0) < tol)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rotation_matrix_between_properties(seed):
    rng = np.random.default_rng(seed)
    for _ in range(20):
        a = rng.normal(size=3)
        b = rng.normal(size=3)
        r = rotation_matrix_between(a, b)
        assert _is_rotation(r)
        got = r @ (a / np.linalg.norm(a))
        np.testing.assert_allclose(got, b / np.linalg.norm(b), atol=1e-8)
    # antipodal input still yields a valid rotation mapping a near -a
    a = np.array([0.3, -0.2, 0.9])
    r = rotation_matrix_between(a, -a)
    assert _is_rotation(r, tol=1e-6)
    np.testing.assert_allclose(r @ (a / np.linalg.norm(a)),
                               -a / np.linalg.norm(a), atol=1e-2)


@pytest.mark.parametrize("method", ["pca", "up", "vertical", "none"])
@pytest.mark.parametrize("center", ["poses", "focus", "none"])
def test_orient_transform_is_rigid_and_consistent(method, center):
    rng = np.random.default_rng(7)
    poses = _look_at_poses(rng, 12, np.array([0.5, -0.3, 0.2]))
    oriented, transform = auto_orient_and_center_poses(
        poses, method=method, center_method=center)
    # pca may flip two axes after the fact; the returned transform must
    # still be consistent with the returned poses in the non-flip modes
    if method != "pca":
        np.testing.assert_allclose(oriented, transform @ poses, atol=1e-9)
        assert _is_rotation(transform[:3, :3], tol=1e-7)
    else:
        assert abs(abs(np.linalg.det(transform[:3, :3])) - 1) < 1e-7
    # rigid: pairwise camera distances preserved
    d0 = np.linalg.norm(poses[:, :3, 3][:, None] - poses[:, :3, 3][None],
                        axis=-1)
    d1 = np.linalg.norm(oriented[:, :3, 3][:, None]
                        - oriented[:, :3, 3][None], axis=-1)
    np.testing.assert_allclose(d0, d1, atol=1e-8)


def test_center_poses_zeroes_mean_origin():
    rng = np.random.default_rng(3)
    poses = _look_at_poses(rng, 9, np.array([2.0, 1.0, -0.5]))
    oriented, _ = auto_orient_and_center_poses(poses, method="up",
                                               center_method="poses")
    np.testing.assert_allclose(oriented[:, :3, 3].mean(0), 0, atol=1e-9)


def test_center_focus_moves_common_target_to_origin():
    rng = np.random.default_rng(4)
    target = np.array([1.2, -0.7, 0.4])
    poses = _look_at_poses(rng, 16, target)
    assert np.linalg.norm(
        focus_of_attention(poses, poses[:, :3, 3].mean(0)) - target) < 1e-6
    oriented, _ = auto_orient_and_center_poses(poses, method="up",
                                               center_method="focus")
    # the common look-at point maps to ~the origin: re-derive it from the
    # oriented poses
    f2 = focus_of_attention(
        np.concatenate([oriented,
                        np.broadcast_to(np.array([[0, 0, 0, 1.0]]),
                                        (len(oriented), 1, 4))], axis=1),
        oriented[:, :3, 3].mean(0))
    assert np.linalg.norm(f2) < 1e-6


def test_up_method_aligns_mean_up_to_z():
    rng = np.random.default_rng(5)
    poses = _look_at_poses(rng, 10, np.zeros(3))
    oriented, _ = auto_orient_and_center_poses(poses, method="up",
                                               center_method="none")
    up = oriented[:, :3, 1].mean(0)
    up = up / np.linalg.norm(up)
    np.testing.assert_allclose(up, [0, 0, 1], atol=1e-9)


def test_pca_rotation_is_principal_axes():
    """The pca transform's rotation columns are the principal axes of the
    camera origins in DESCENDING variance order (reference semantics:
    ``camera_utils.py:571-577`` applies the eigenvector matrix V — note the
    reference applies V, not V.T, so R.T (not R) diagonalizes the
    covariance; parity pins that exact behavior)."""
    rng = np.random.default_rng(6)
    poses = _look_at_poses(rng, 40, np.zeros(3))
    poses[:, :3, 3] *= np.array([4.0, 1.0, 0.2])
    oriented, transform = auto_orient_and_center_poses(
        poses, method="pca", center_method="poses")
    o = poses[:, :3, 3]
    cov = (o - o.mean(0)).T @ (o - o.mean(0))
    r = transform[:3, :3]
    lam = r.T @ cov @ r
    off = lam - np.diag(np.diag(lam))
    assert np.abs(off).max() < 1e-6 * np.abs(np.diag(lam)).max()
    v = np.diag(lam)
    assert v[0] >= v[1] >= v[2]
    # flip normalization: mean oriented up-column has non-negative z
    assert oriented.mean(0)[2, 1] >= 0


def test_up_equivariance_under_rigid_pretransform():
    """Pre-rotating/translating the whole capture changes the result by at
    most a rotation about +z (the free axis of the 'up' alignment)."""
    rng = np.random.default_rng(8)
    poses = _look_at_poses(rng, 14, np.array([0.3, 0.1, -0.2]))
    pre = np.eye(4)
    pre[:3, :3] = _rand_rot(rng)
    pre[:3, 3] = rng.normal(size=3)
    o1, _ = auto_orient_and_center_poses(poses, "up", "poses")
    o2, _ = auto_orient_and_center_poses(pre @ poses, "up", "poses")
    p1, p2 = o1[:, :3, 3], o2[:, :3, 3]
    # z coordinates must agree exactly; xy up to one global rotation
    np.testing.assert_allclose(p1[:, 2], p2[:, 2], atol=1e-8)
    a, b = p1[:, :2], p2[:, :2]
    # optimal 2-D rotation (SVD Procrustes); a reflection would mean the
    # property itself failed
    u, _, vt = np.linalg.svd(a.T @ b)
    rot = u @ vt
    assert np.linalg.det(rot) > 0
    np.testing.assert_allclose(a @ rot, b, atol=1e-8)
