"""Non-pinhole camera support: equirect/fisheye ray dirs, fisheye624 model.

Conventions mirror the reference ``Cameras.generate_rays``
(``nerfstudio/cameras/cameras.py:805-816``) and ``fisheye624_project``
(``nerfstudio/cameras/camera_utils.py:634``).
"""

import jax.numpy as jnp
import numpy as np

from gstex_tpu.data.fisheye624 import (fisheye624_project,
                                       fisheye624_unproject,
                                       undistort_fisheye624)
from gstex_tpu.ops.camera import make_camera, ray_dirs_typed

C2W_ID = jnp.concatenate(
    [jnp.eye(3), jnp.zeros((3, 1))], axis=1)  # identity pose


def _cam(h, w, fx, fy):
    return make_camera(fx, fy, w / 2.0, h / 2.0, h, w, C2W_ID)


def test_equirect_center_and_poles():
    h, w = 128, 256
    cam = _cam(h, w, h, h)  # equirect: fx = fy = height = width/2
    cx, cy = w / 2.0 - 0.5, h / 2.0 - 0.5
    d = ray_dirs_typed(jnp.array([cx]), jnp.array([cy]), cam,
                       "equirectangular")
    d = np.asarray(d)[0]
    # identity pose: OpenCV +z forward maps to world -z (gsplat flip keeps x)
    np.testing.assert_allclose(np.abs(d[2]), 1.0, atol=1e-5)
    np.testing.assert_allclose(d[:2], 0.0, atol=1e-5)
    # all dirs unit norm
    xs = jnp.arange(0, w, 16, dtype=jnp.float32)
    ys = jnp.full_like(xs, cy)
    dd = np.asarray(ray_dirs_typed(xs, ys, cam, "equirectangular"))
    np.testing.assert_allclose(np.linalg.norm(dd, axis=-1), 1.0, atol=1e-5)
    # top row points up (world +y after the gsplat flip maps -y_cv)
    dt = np.asarray(ray_dirs_typed(jnp.array([cx]), jnp.array([2.0]), cam,
                                   "equirectangular"))[0]
    assert abs(dt[1]) > 0.9


def test_fisheye_center_forward():
    cam = _cam(64, 64, 32.0, 32.0)
    d = np.asarray(ray_dirs_typed(jnp.array([31.5]), jnp.array([31.5]), cam,
                                  "fisheye"))[0]
    np.testing.assert_allclose(np.abs(d[2]), 1.0, atol=1e-5)


def test_fisheye624_roundtrip():
    rng = np.random.default_rng(0)
    params = np.array([400.0, 410.0, 320.0, 240.0,
                       0.01, -0.005, 0.002, 0.0, 0.0, 0.0,
                       1e-3, -5e-4, 2e-4, -1e-4, 1e-4, 5e-5])
    dirs = rng.normal(size=(64, 3)) * np.array([0.3, 0.3, 0.0]) + \
        np.array([0.0, 0.0, 1.0])
    uv = fisheye624_project(dirs, params)
    back = fisheye624_unproject(uv, params)
    uv2 = fisheye624_project(back, params)
    np.testing.assert_allclose(uv2, uv, atol=1e-3)
    # unprojected rays parallel to the originals
    dn = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    np.testing.assert_allclose(back, dn, atol=1e-4)


def test_fisheye624_undistort_shapes():
    params = np.array([300.0, 300.0, 256.0, 256.0,
                       0.02, 0.0, 0.0, 0.0, 0.0, 0.0,
                       0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    img = np.zeros((512, 512, 3), np.uint8)
    img[250:262, 250:262] = 255
    out, mask, fx, fy, cx, cy = undistort_fisheye624(img, params, 200.0)
    assert out.shape == (400, 400, 3)
    assert mask.shape == (400, 400)
    assert mask[200, 200] == 1 and mask[0, 0] == 0
    # the center blob survives rectification near the new center
    assert out[int(cy) - 8:int(cy) + 8, int(cx) - 8:int(cx) + 8].max() > 128
