"""Pinhole camera model and 2D-surfel projection (pure jnp).

Covers ``gstex_cuda.get_aabb_2d.{project_points, get_aabb_2d}`` (call sites:
reference ``nerfstudio/models/gstex.py:528-532,1077-1080``) and the gsplat
camera convention used at ``gstex.py:1031-1042``.

Conventions:
- ``c2w`` is the nerfstudio camera-to-world (3,4): +x right, +y up, camera
  looks along −z (OpenGL).
- ``viewmat`` is world-to-camera in the gsplat convention: +z forward, y down
  — obtained by flipping the y/z columns, ``R ← R·diag(1,−1,−1)``
  (``gstex.py:1034``).
- Continuous pixel coordinate ``px`` equals the column/row index at pixel
  centers: ray through pixel (row i, col j) has camera-space direction
  ``((j+.5−cx)/fx, (i+.5−cy)/fy, 1)`` (pixel-center convention of
  ``gstex.py:138-139``); projection is ``px = fx·X/Z + cx − 0.5``.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

# Every matmul in this module is a tiny (*, 3) @ (3, 3) geometry transform.
# On TPU, f32 matmuls lower to ONE bf16 MXU pass by default — rel error
# ~4e-3, which shifted projected centers by up to 2.7 px and ray
# directions enough to move ray-surfel hits on trained (sharp) scenes by
# whole texels (the round-4 renderer-consistency failure: 0.43 max rgb
# divergence was the XLA/oracle tiers' degraded `d_cam @ R.T`, not the
# Pallas kernel, which computes dirs with explicit f32 VPU muls). These
# ops are microscopic — force full f32 everywhere.
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Camera:
    """A single pinhole camera. Registered as a pytree with height/width as
    STATIC aux data (they set image/grid shapes under jit)."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    height: int  # static
    width: int  # static
    c2w: jax.Array  # (3,4) nerfstudio/OpenGL convention

    @property
    def intrins(self):
        return (self.fx, self.fy, self.cx, self.cy)

    def tree_flatten(self):
        return (self.fx, self.fy, self.cx, self.cy, self.c2w), (
            self.height, self.width)

    @classmethod
    def tree_unflatten(cls, aux, children):
        fx, fy, cx, cy, c2w = children
        h, w = aux
        return cls(fx=fx, fy=fy, cx=cx, cy=cy, height=h, width=w, c2w=c2w)


def make_camera(fx, fy, cx, cy, height, width, c2w) -> Camera:
    c2w = jnp.asarray(c2w, dtype=jnp.float32)[:3, :4]
    f32 = lambda v: jnp.asarray(v, dtype=jnp.float32)
    return Camera(f32(fx), f32(fy), f32(cx), f32(cy), int(height), int(width), c2w)


def stack_cameras(cams: list) -> Camera:
    """Stack same-resolution cameras into one Camera pytree with a leading
    chunk axis on the array leaves (scan input for ``make_train_scan``)."""
    h, w = cams[0].height, cams[0].width
    if any(c.height != h or c.width != w for c in cams):
        raise ValueError("stack_cameras requires equal resolutions")
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def viewmat_from_c2w(c2w: jax.Array) -> jax.Array:
    """(3,4) nerfstudio c2w -> (4,4) gsplat world-to-camera (``gstex.py:1031-1042``)."""
    R = c2w[:3, :3]
    T = c2w[:3, 3:4]
    flip = jnp.diag(jnp.array([1.0, -1.0, -1.0], dtype=c2w.dtype))
    R = _mm(R, flip)
    R_inv = R.T
    T_inv = -_mm(R_inv, T)
    view = jnp.eye(4, dtype=c2w.dtype)
    view = view.at[:3, :3].set(R_inv)
    view = view.at[:3, 3:4].set(T_inv)
    return view


def camera_origin(c2w: jax.Array) -> jax.Array:
    """World-space camera center."""
    return c2w[:3, 3]


def camera_rotation_gsplat(c2w: jax.Array) -> jax.Array:
    """(3,3) camera-to-world rotation in the gsplat (z-forward) convention."""
    flip = jnp.diag(jnp.array([1.0, -1.0, -1.0], dtype=c2w.dtype))
    return _mm(c2w[:3, :3], flip)


def project_points(means: jax.Array, viewmat: jax.Array, intrins) -> tuple[jax.Array, jax.Array]:
    """Project world points through the gsplat viewmat + pinhole intrinsics.

    Mirrors ``gstex_cuda.get_aabb_2d.project_points`` (``gstex.py:1077``).

    Returns:
        xys: (N,2) continuous pixel coords (x=column, y=row).
        depths: (N,) view-space z.
    """
    fx, fy, cx, cy = intrins
    p = _mm(means, viewmat[:3, :3].T) + viewmat[:3, 3]
    z = p[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    x = fx * p[..., 0] / safe_z + cx - 0.5
    y = fy * p[..., 1] / safe_z + cy - 0.5
    return jnp.stack([x, y], axis=-1), z


def pixel_ray_dirs(px_x: jax.Array, px_y: jax.Array, cam: Camera) -> jax.Array:
    """World-space (unnormalized) ray directions for continuous pixel coords.

    The returned direction has unit view-space z, so the ray parameter ``t``
    in ``o + t·d`` IS the view-space depth (matches the reference's use of
    rendered depth as view z, ``gstex.py:146``).
    """
    dx = (px_x + 0.5 - cam.cx) / cam.fx
    dy = (px_y + 0.5 - cam.cy) / cam.fy
    d_cam = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)
    R = camera_rotation_gsplat(cam.c2w)
    return _mm(d_cam, R.T)


def ray_dirs_typed(px_x: jax.Array, px_y: jax.Array, cam: Camera,
                   camera_type: str = "perspective") -> jax.Array:
    """World-space ray directions for non-pinhole camera types.

    Implements the reference ``Cameras.generate_rays`` direction math
    (``nerfstudio/cameras/cameras.py:805-816`` equirectangular spherical
    coords; fisheye equidistant branch) in the OpenCV camera frame this
    module uses (+z forward, +y down; the gsplat diag(1,-1,-1) flip lives
    inside ``camera_rotation_gsplat``). Perspective rays keep unit view-z
    (ray parameter == view depth); fisheye/equirect rays are unit-norm.
    """
    if camera_type == "perspective":
        return pixel_ray_dirs(px_x, px_y, cam)
    x = (px_x + 0.5 - cam.cx) / cam.fx
    y = (px_y + 0.5 - cam.cy) / cam.fy
    if camera_type == "fisheye":
        # equidistant: angle from axis = normalized radius
        theta = jnp.minimum(jnp.sqrt(x * x + y * y), jnp.pi)
        sinc = jnp.where(theta < 1e-9, 1.0, jnp.sin(theta)
                         / jnp.maximum(theta, 1e-9))
        d_cam = jnp.stack([x * sinc, y * sinc, jnp.cos(theta)], axis=-1)
    elif camera_type == "equirectangular":
        # reference: for equirect fx = fy = height = width/2; x in [-1,1],
        # y in [-1/2,1/2]; theta = -pi*x, phi = pi*(0.5 - y_gl). Their dirs
        # are OpenGL (+y up, -z fwd); converted here to OpenCV.
        theta = -jnp.pi * x
        phi = jnp.pi * (0.5 + y)
        d_cam = jnp.stack([
            -jnp.sin(theta) * jnp.sin(phi),
            -jnp.cos(phi),
            jnp.cos(theta) * jnp.sin(phi),
        ], axis=-1)
    else:
        raise ValueError(f"unsupported camera_type {camera_type}")
    R = camera_rotation_gsplat(cam.c2w)
    return _mm(d_cam, R.T)


def surfel_aabb_2d(
    means: jax.Array,
    l0: jax.Array,
    l1: jax.Array,
    rotmats: jax.Array,
    viewmat: jax.Array,
    intrins,
    extent_sigma: float = 3.0,
    aa_margin: float = 3.0,
    near: float = 0.01,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Screen-space AABB of each 2D surfel (``gstex_cuda.get_aabb_2d.get_aabb_2d``,
    ``gstex.py:1079``).

    The surfel's ±extent_sigma·σ parallelogram corners are projected; their
    AABB (a convex bound on the projected ellipse) is padded by ``aa_margin``
    pixels for the screen-space low-pass filter (settings bit 9).

    Returns:
        centers (N,2), extents (N,2) half-sizes in pixels, valid (N,) bool
        (False ⇒ the surfel is culled: behind the near plane).
    """
    fx, fy, cx, cy = intrins
    ax1 = rotmats[..., :, 0]
    ax2 = rotmats[..., :, 1]
    e1 = extent_sigma * l0[..., None] * ax1
    e2 = extent_sigma * l1[..., None] * ax2
    corners = jnp.stack(
        [means + e1 + e2, means + e1 - e2, means - e1 + e2, means - e1 - e2],
        axis=-2,
    )  # (N,4,3)
    pv = _mm(corners, viewmat[:3, :3].T) + viewmat[:3, 3]
    z = pv[..., 2]
    valid = jnp.max(z, axis=-1) > near
    zc = jnp.maximum(z, near)
    x = fx * pv[..., 0] / zc + cx - 0.5
    y = fy * pv[..., 1] / zc + cy - 0.5
    x_min, x_max = jnp.min(x, axis=-1), jnp.max(x, axis=-1)
    y_min, y_max = jnp.min(y, axis=-1), jnp.max(y, axis=-1)
    centers = jnp.stack([(x_min + x_max) * 0.5, (y_min + y_max) * 0.5], axis=-1)
    extents = jnp.stack(
        [(x_max - x_min) * 0.5 + aa_margin, (y_max - y_min) * 0.5 + aa_margin],
        axis=-1,
    )
    return centers, extents, valid
