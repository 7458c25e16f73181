"""Equirect / ODS panorama rendering (ops/pano.py): geometric placement
of known scene content in the lat-long grid, pinhole consistency, and the
end-to-end render path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.ops import pano

CFG = model.GStexConfig(chart_pad=(4, 4), tile_h=8, tile_w=16,
                        pair_cap=1 << 13, s_max=64, pixel_num=300,
                        background_color="black", renderer="xla")


def _single_blob(direction, color):
    """One opaque gaussian at ``direction`` from the origin-camera."""
    scene = random_scene(jax.random.key(0), 4, chart_pad=CFG.chart_pad)
    means = np.zeros((4, 3), np.float32)
    means[0] = 2.0 * np.asarray(direction)
    means[1:] = 100.0  # park the rest far away
    scene["means"] = jnp.asarray(means)
    scene["opacity_logits"] = jnp.full((4, 1), 8.0)
    scene["log_scales"] = jnp.full((4, 2), np.log(0.25))
    fdc = np.zeros((4, 3), np.float32)
    fdc[0] = color
    scene["features_dc"] = jnp.asarray(fdc)
    scene["features_rest"] = 0.0 * scene["features_rest"]
    scene["texture"] = 0.0 * scene["texture"]
    return model.init_params(CFG, scene["means"], scene["log_scales"],
                             scene["quats"], scene["opacity_logits"],
                             scene["features_dc"], scene["features_rest"])


def _cam_at_origin():
    cam = orbit_camera(64, 64, dist=1e-6)
    c2w = np.eye(3, 4, dtype=np.float32)   # identity pose at origin
    return c2w


def _render_one(params, buffers):
    def render_one(cam):
        return model.render(CFG, params, buffers, cam, jnp.int32(0),
                            jnp.zeros(3))["rgb"]

    return render_one


@pytest.mark.slow
def test_equirect_blob_placement():
    """A blob straight ahead of the pose lands at the pano center; one to
    the camera's right lands a quarter-width off (reference equirect
    parameterization, cameras.py:805-816)."""
    c2w = _cam_at_origin()
    h, w = 64, 128
    # identity c2w: gsplat cam forward (+z view) is world -z... the cv
    # frame's +z forward maps through diag(1,-1,-1): world fwd = -z col
    r_cv = c2w[:3, :3] @ np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    fwd = r_cv[:, 2]
    right = r_cv[:, 0]
    for direction, col in ((fwd, w // 2), (right, 3 * w // 4)):
        params, buffers = _single_blob(direction, (0.5, 0.0, 0.0))
        img = np.asarray(pano.render_equirect(
            _render_one(params, buffers), c2w, h, w, face_res=64))
        bright = np.unravel_index(np.argmax(img.sum(-1)), img.shape[:2])
        assert abs(bright[1] - col) <= 3, (direction, bright, col)
        assert abs(bright[0] - h // 2) <= 3, bright


def test_equirect_matches_pinhole_center():
    """The pano around the forward direction agrees with a narrow pinhole
    render of the same scene (exact up to the bilinear resample)."""
    scene = random_scene(jax.random.key(3), 48, chart_pad=CFG.chart_pad)
    params, buffers = model.init_params(
        CFG, scene["means"], scene["log_scales"], scene["quats"],
        scene["opacity_logits"] + 2.0, scene["features_dc"],
        scene["features_rest"])
    cam = orbit_camera(64, 64, dist=3.0)
    c2w = np.asarray(cam.c2w)
    h, w = 128, 256
    img = np.asarray(pano.render_equirect(_render_one(params, buffers),
                                          c2w, h, w, face_res=128))
    # forward direction = pano center pixel; compare against the center
    # pixel of a 90-degree pinhole at the same pose
    from gstex_tpu.ops.camera import make_camera

    f = 64.0
    pin = make_camera(f, f, 64.0, 64.0, 128, 128, c2w)
    ref = np.asarray(model.render(CFG, params, buffers, pin, jnp.int32(0),
                                  jnp.zeros(3))["rgb"])
    np.testing.assert_allclose(img[h // 2, w // 2], ref[64, 64], atol=0.06)


@pytest.mark.slow
def test_ods_shape_and_parallax():
    scene = random_scene(jax.random.key(5), 32, chart_pad=CFG.chart_pad)
    params, buffers = model.init_params(
        CFG, scene["means"], scene["log_scales"], scene["quats"],
        scene["opacity_logits"] + 2.0, scene["features_dc"],
        scene["features_rest"])
    cam = orbit_camera(64, 64, dist=3.0)
    out = np.asarray(pano.render_ods(_render_one(params, buffers),
                                     np.asarray(cam.c2w), 32, 64,
                                     ipd=0.5, face_res=32))
    assert out.shape == (64, 64, 3)
    left, right = out[:32], out[32:]
    assert np.abs(left - right).max() > 1e-3, "no stereo parallax"
