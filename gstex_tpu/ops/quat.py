"""Quaternion / rotation utilities (pure jnp).

Covers the capability of ``gstex_cuda._torch_impl.quat_to_rotmat`` /
``normalized_quat_to_rotmat`` (call sites: reference
``nerfstudio/models/gstex.py:28,977``) and the pytorch3d-style conversions in
reference ``nerfstudio/utils/rotations.py`` (``quaternion_to_matrix``,
``matrix_to_quaternion`` used by the fix_init remap at ``gstex.py:656-661``).

Convention: quaternions are (w, x, y, z), matching the 2DGS/gsplat ply format
(``rot_0..rot_3`` loaded in order at ``gstex.py:637-641``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_quat(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize quaternions along the last axis (``gstex.py:1062``)."""
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix.

    Normalizes first (mirrors ``_torch_impl.quat_to_rotmat``). Columns of the
    result are the surfel axes: R[..., :, 0] = ax1 (u axis), R[..., :, 1] = ax2
    (v axis), R[..., :, 2] = normal.
    """
    q = normalize_quat(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(m: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion.

    Branch-free (jnp.where over the four standard cases), mirroring the
    capability of ``rotations.matrix_to_quaternion`` used by fix_init
    (``gstex.py:661``).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # case w: trace dominant
    sw = safe_sqrt(1.0 + tr) * 0.5  # = w
    qw_w = sw
    qw_x = (m21 - m12) / (4.0 * sw)
    qw_y = (m02 - m20) / (4.0 * sw)
    qw_z = (m10 - m01) / (4.0 * sw)
    # case x dominant
    sx = safe_sqrt(1.0 + m00 - m11 - m22) * 0.5
    qx_w = (m21 - m12) / (4.0 * sx)
    qx_x = sx
    qx_y = (m01 + m10) / (4.0 * sx)
    qx_z = (m02 + m20) / (4.0 * sx)
    # case y dominant
    sy = safe_sqrt(1.0 - m00 + m11 - m22) * 0.5
    qy_w = (m02 - m20) / (4.0 * sy)
    qy_x = (m01 + m10) / (4.0 * sy)
    qy_y = sy
    qy_z = (m12 + m21) / (4.0 * sy)
    # case z dominant
    sz = safe_sqrt(1.0 - m00 - m11 + m22) * 0.5
    qz_w = (m10 - m01) / (4.0 * sz)
    qz_x = (m02 + m20) / (4.0 * sz)
    qz_y = (m12 + m21) / (4.0 * sz)
    qz_z = sz

    use_w = tr > 0.0
    use_x = jnp.logical_and(~use_w, jnp.logical_and(m00 >= m11, m00 >= m22))
    use_y = jnp.logical_and(~use_w, jnp.logical_and(~use_x, m11 >= m22))

    def pick(a, b, c, d):
        return jnp.where(use_w, a, jnp.where(use_x, b, jnp.where(use_y, c, d)))

    q = jnp.stack(
        [
            pick(qw_w, qx_w, qy_w, qz_w),
            pick(qw_x, qx_x, qy_x, qz_x),
            pick(qw_y, qx_y, qy_y, qz_y),
            pick(qw_z, qx_z, qy_z, qz_z),
        ],
        axis=-1,
    )
    return normalize_quat(q)


def random_quats(key: jax.Array, n: int) -> jax.Array:
    """Uniform random unit quaternions, mirroring ``gstex.py:68-83``."""
    u, v, w = jax.random.uniform(key, (3, n))
    two_pi = 2.0 * jnp.pi
    return jnp.stack(
        [
            jnp.sqrt(1.0 - u) * jnp.sin(two_pi * v),
            jnp.sqrt(1.0 - u) * jnp.cos(two_pi * v),
            jnp.sqrt(u) * jnp.sin(two_pi * w),
            jnp.sqrt(u) * jnp.cos(two_pi * w),
        ],
        axis=-1,
    )


def fix_init_rotation(quats: jax.Array) -> jax.Array:
    """COLMAP coordinate fix: rows (x,y,z) -> (x,z,-y) of the rotation matrix
    (``gstex.py:656-661``), returned as quaternions."""
    rm = quat_to_rotmat(quats)
    fixed = jnp.stack([rm[..., 0, :], rm[..., 2, :], -rm[..., 1, :]], axis=-2)
    return rotmat_to_quat(fixed)


def fix_init_points(xyz: jax.Array) -> jax.Array:
    """COLMAP coordinate fix for points: (x,y,z) -> (x,z,-y) (``gstex.py:651-654``)."""
    return jnp.stack([xyz[..., 0], xyz[..., 2], -xyz[..., 1]], axis=-1)
