import jax
import jax.numpy as jnp
import numpy as np

from gstex_tpu.ops.quat import (
    fix_init_points,
    fix_init_rotation,
    normalize_quat,
    quat_to_rotmat,
    random_quats,
    rotmat_to_quat,
)


def test_quat_to_rotmat_identity():
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(quat_to_rotmat(q), jnp.eye(3), atol=1e-6)


def test_quat_to_rotmat_orthonormal():
    qs = random_quats(jax.random.key(0), 128)
    rs = quat_to_rotmat(qs)
    eyes = jnp.einsum("nij,nkj->nik", rs, rs)
    np.testing.assert_allclose(eyes, np.broadcast_to(np.eye(3), (128, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(rs)), np.ones(128), atol=1e-5)


def test_quat_roundtrip():
    qs = np.asarray(random_quats(jax.random.key(1), 256))
    back = np.asarray(rotmat_to_quat(quat_to_rotmat(qs)))
    # q and -q are the same rotation
    sign = np.sign(np.sum(back * qs, axis=-1, keepdims=True))
    np.testing.assert_allclose(back * sign, qs, atol=1e-4)


def test_quat_90deg_z():
    # 90 degrees about z: (w,x,y,z) = (cos45, 0, 0, sin45)
    s = np.sin(np.pi / 4)
    q = jnp.array([np.cos(np.pi / 4), 0.0, 0.0, s])
    r = np.asarray(quat_to_rotmat(q))
    expected = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(r, expected, atol=1e-6)


def test_fix_init_consistency():
    # rotating the points and the frames the same way preserves dot products
    qs = random_quats(jax.random.key(2), 64)
    pts = jax.random.normal(jax.random.key(3), (64, 3))
    r_old = quat_to_rotmat(qs)
    r_new = quat_to_rotmat(fix_init_rotation(qs))
    p_new = fix_init_points(pts)
    # axis columns transform like points
    for col in range(3):
        np.testing.assert_allclose(
            np.asarray(fix_init_points(r_old[:, :, col])),
            np.asarray(r_new[:, :, col]),
            atol=1e-4,
        )
    # and the map is a rotation (norm preserved)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(p_new), axis=-1),
        np.linalg.norm(np.asarray(pts), axis=-1),
        rtol=1e-5,
    )


def test_normalize_quat():
    q = jnp.array([[2.0, 0.0, 0.0, 0.0], [0.0, 3.0, 4.0, 0.0]])
    n = np.asarray(normalize_quat(q))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), [1.0, 1.0], atol=1e-6)
