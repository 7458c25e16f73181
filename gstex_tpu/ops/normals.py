"""Depth-map → point-map → normal-map estimation (pure jnp).

Mirrors ``depths_to_points`` / ``depth_to_normal`` (reference
``nerfstudio/models/gstex.py:122-161``): unproject view-z depths along
normalized world rays, central-difference cross products, zero border.
Used by the ``use_normal_loss`` path (``gstex.py:1218-1222``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .camera import Camera, camera_origin, pixel_ray_dirs


def depths_to_points(depths: jax.Array, cam: Camera) -> jax.Array:
    """(H, W) view-z depth map -> (H, W, 3) world points."""
    H, W = cam.height, cam.width
    py, px = jnp.mgrid[0:H, 0:W]
    dirs = pixel_ray_dirs(px.astype(jnp.float32), py.astype(jnp.float32), cam)
    # dirs have unit view z; normalize like the reference, then rescale the
    # ray parameter so the view depth matches (gstex.py:140-147)
    norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    unit = dirs / (norm + 1e-9)
    view_z = 1.0 / (norm[..., 0] + 1e-9)   # z-component of the unit ray
    ts = depths / jnp.maximum(view_z, 1e-9)
    origin = camera_origin(cam.c2w)
    return origin + ts[..., None] * unit


def depth_to_normal(depths: jax.Array, cam: Camera) -> jax.Array:
    """(H, W) depth -> (H, W, 3) estimated normals (zero border)."""
    points = depths_to_points(depths, cam)
    dx = points[2:, 1:-1] - points[:-2, 1:-1]
    dy = points[1:-1, 2:] - points[1:-1, :-2]
    n = jnp.cross(dx, dy)
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-9)
    out = jnp.zeros_like(points)
    return out.at[1:-1, 1:-1].set(n)
