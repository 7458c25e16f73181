import jax.numpy as jnp
import numpy as np

from gstex_tpu.ops.camera import (
    camera_origin,
    make_camera,
    pixel_ray_dirs,
    project_points,
    surfel_aabb_2d,
    viewmat_from_c2w,
)
from gstex_tpu.ops.quat import quat_to_rotmat


def look_at_origin_camera(dist=4.0, h=64, w=64, f=80.0):
    # camera at (0,0,dist) in nerfstudio convention looking along -z at origin
    c2w = np.eye(4)[:3]
    c2w[:, 3] = [0.0, 0.0, dist]
    return make_camera(f, f, w / 2, h / 2, h, w, c2w)


def test_project_center_point():
    cam = look_at_origin_camera()
    xys, depths = project_points(
        jnp.zeros((1, 3)), viewmat_from_c2w(cam.c2w), cam.intrins)
    # origin projects to the principal point (pixel-center convention: -0.5)
    np.testing.assert_allclose(np.asarray(xys), [[31.5, 31.5]], atol=1e-5)
    np.testing.assert_allclose(np.asarray(depths), [4.0], atol=1e-6)


def test_projection_ray_roundtrip():
    cam = look_at_origin_camera()
    pts = jnp.array([[0.3, -0.2, 1.0], [-0.5, 0.4, -1.0], [0.1, 0.1, 0.0]])
    viewmat = viewmat_from_c2w(cam.c2w)
    xys, depths = project_points(pts, viewmat, cam.intrins)
    dirs = pixel_ray_dirs(xys[:, 0], xys[:, 1], cam)
    origin = camera_origin(cam.c2w)
    # o + depth * d must reconstruct the point (d has unit view-space z)
    recon = origin + depths[:, None] * dirs
    np.testing.assert_allclose(np.asarray(recon), np.asarray(pts), atol=2e-3)


def test_viewmat_flip_convention():
    cam = look_at_origin_camera(dist=4.0)
    viewmat = viewmat_from_c2w(cam.c2w)
    # point in front of the camera has positive view z (gsplat convention)
    p = jnp.array([0.0, 0.0, 0.0, 1.0])
    pv = viewmat @ p
    assert pv[2] > 0
    # y axis is flipped: a world +y point appears at negative view y
    py = viewmat @ jnp.array([0.0, 1.0, 0.0, 1.0])
    assert py[1] < 0


def test_aabb_contains_projection():
    cam = look_at_origin_camera()
    means = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.5, 1.0]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0], [0.9, 0.1, 0.3, 0.2]])
    R = quat_to_rotmat(quats)
    l0 = jnp.array([0.2, 0.1])
    l1 = jnp.array([0.1, 0.3])
    viewmat = viewmat_from_c2w(cam.c2w)
    centers, extents, valid = surfel_aabb_2d(means, l0, l1, R, viewmat, cam.intrins)
    assert bool(valid.all())
    xys, _ = project_points(means, viewmat, cam.intrins)
    # projected center inside the AABB
    assert bool(jnp.all(jnp.abs(xys - centers) <= extents))
    # AABB covers at least the AA margin
    assert bool(jnp.all(extents >= 3.0))


def test_behind_camera_culled():
    cam = look_at_origin_camera(dist=4.0)
    means = jnp.array([[0.0, 0.0, 10.0]])  # behind the camera (z>dist)
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    R = quat_to_rotmat(quats)
    viewmat = viewmat_from_c2w(cam.c2w)
    _, _, valid = surfel_aabb_2d(
        means, jnp.array([0.1]), jnp.array([0.1]), R, viewmat, cam.intrins)
    assert not bool(valid[0])
