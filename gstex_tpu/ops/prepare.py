"""Per-frame splat preparation: activations, SH color, projection, culling.

Mirrors the precompute section of ``GStexModel.get_outputs`` (reference
``nerfstudio/models/gstex.py:1059-1111``): exp/clamp scale activation with the
pinned third axis, sigmoid opacity, quat normalization, detached-viewdir SH
with zeroed dc, gsplat camera flip, and the fix_init view-direction remap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import sh as sh_ops
from .camera import Camera, project_points, surfel_aabb_2d, viewmat_from_c2w
from .quat import normalize_quat, quat_to_rotmat
from .surfel import SplatGeom


class PreparedSplats(NamedTuple):
    geom: SplatGeom
    depths: jax.Array    # (N,) view z of centers
    centers: jax.Array   # (N,2) screen AABB centers
    extents: jax.Array   # (N,2) screen AABB half extents
    valid: jax.Array     # (N,) bool


def activate_scales(log_scales: jax.Array) -> tuple[jax.Array, jax.Array]:
    """l = clamp(exp(s), 1e-9) for the two surfel axes (``gstex.py:1063-1064``)."""
    l = jnp.maximum(jnp.exp(log_scales), 1e-9)
    return l[..., 0], l[..., 1]


def prepare_splats(
    means: jax.Array,
    log_scales: jax.Array,      # (N,2)
    quats: jax.Array,           # (N,4) wxyz
    opacity_logits: jax.Array,  # (N,1) or (N,)
    features_dc: jax.Array,     # (N,3)
    features_rest: jax.Array,   # (N,K-1,3)
    mappings: jax.Array,        # (N,2) chart uv scales (buffer, detached in use)
    cam: Camera,
    active_sh_degree,
    sh_degree: int = 3,
    fix_init: bool = False,
    extent_sigma: float = 3.0,
) -> PreparedSplats:
    viewmat = viewmat_from_c2w(cam.c2w)
    quats_n = normalize_quat(quats)
    R = quat_to_rotmat(quats_n)
    ax1, ax2, normal = R[..., :, 0], R[..., :, 1], R[..., :, 2]
    l0, l1 = activate_scales(log_scales)
    opacity = jax.nn.sigmoid(opacity_logits.reshape(-1))

    if sh_degree > 0:
        # dc is zeroed in the view-dependent color (gstex.py:1100); viewdirs
        # use detached means (gstex.py:1101)
        coeffs = jnp.concatenate(
            [jnp.zeros_like(features_dc[:, None, :]), features_rest], axis=1)
        cam_pos = cam.c2w[:3, 3]
        viewdirs = jax.lax.stop_gradient(means) - cam_pos
        viewdirs = viewdirs / (jnp.linalg.norm(viewdirs, axis=-1, keepdims=True) + 1e-12)
        if fix_init:
            # (x, y, z) -> (x, -z, y)  (gstex.py:1104-1108)
            viewdirs = jnp.stack(
                [viewdirs[..., 0], -viewdirs[..., 2], viewdirs[..., 1]], axis=-1)
        rgb = sh_ops.spherical_harmonics(active_sh_degree, viewdirs, coeffs)
    else:
        rgb = jax.nn.sigmoid(features_dc)

    xys, depths = project_points(means, viewmat, cam.intrins)
    centers, extents, valid = surfel_aabb_2d(
        means, l0, l1, R, viewmat, cam.intrins, extent_sigma=extent_sigma)
    valid = jnp.logical_and(valid, depths > 1e-6)

    geom = SplatGeom(
        mean=means, ax1=ax1, ax2=ax2, normal=normal,
        l0=l0, l1=l1, opacity=opacity, rgb=rgb, xy=xys,
        uv_scale=mappings,
    )
    return PreparedSplats(geom=geom, depths=depths, centers=centers,
                          extents=extents, valid=valid)
