"""Fisheye (OPENCV_FISHEYE) dataset path: transforms.json parsing +
cv2.fisheye undistortion at cache time.

Mirrors the FISHEYE branch of ``_undistort_image``
(``full_images_datamanager.py:439-470``): equidistant distortion with
k1..k4, rectified to a pinhole camera whose intrinsics replace the
originals in the cached Camera.
"""

import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from gstex_tpu.data.manager import FullImageCache
from gstex_tpu.data.nerfstudio_parser import parse_nerfstudio


H = W = 64
K1 = 0.15


def _make_dataset(root):
    from PIL import Image

    (root / "images").mkdir()
    # checkerboard ground truth, forward-distorted with the fisheye model so
    # the cache's undistortion is exercised on a non-trivial image
    yy, xx = np.mgrid[:H, :W]
    gt = (((yy // 8) + (xx // 8)) % 2 * 255).astype(np.uint8)
    gt = np.stack([gt] * 3, -1)
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    d = np.array([K1, 0.0, 0.0, 0.0])
    # true forward distortion: each distorted pixel samples the ideal image
    # at the undistorted location of its ray (fisheye.undistortPoints maps
    # distorted pixel -> ideal pixel when P=K)
    yy2, xx2 = np.mgrid[:H, :W].astype(np.float64)
    pts = np.stack([xx2.ravel(), yy2.ravel()], -1).reshape(-1, 1, 2)
    und = cv2.fisheye.undistortPoints(pts, K, d, P=K).reshape(H, W, 2)
    dist_img = cv2.remap(gt, und[..., 0].astype(np.float32),
                         und[..., 1].astype(np.float32),
                         interpolation=cv2.INTER_LINEAR)

    frames = []
    for i in range(3):
        name = f"images/im{i}.png"
        Image.fromarray(dist_img).save(root / name)
        c2w = np.eye(4)
        c2w[2, 3] = 2.0 + i
        frames.append({"file_path": name,
                       "transform_matrix": c2w.tolist()})
    meta = {
        "camera_model": "OPENCV_FISHEYE",
        "fl_x": 60.0, "fl_y": 60.0, "cx": W / 2, "cy": H / 2,
        "w": W, "h": H,
        "k1": K1, "k2": 0.0, "k3": 0.0, "k4": 0.0,
        "frames": frames,
    }
    (root / "transforms.json").write_text(json.dumps(meta))


def test_fisheye_parse_and_undistort(tmp_path):
    _make_dataset(tmp_path)
    parsed = parse_nerfstudio(tmp_path, split="train", eval_mode="all")
    assert parsed.camera_type == "fisheye"
    assert np.isclose(parsed.distortion[0, 0], K1)

    cache = FullImageCache.build(parsed, max_workers=2)
    assert len(cache.images) == 3
    cam = cache.cameras[0]
    # rectified intrinsics differ from the raw ones (balance=0 crops in)
    assert not np.isclose(float(cam.fx), 60.0)
    assert cache.images[0].shape[:2] == (H, W)
    # the undistorted cache image should match the ideal checkerboard
    # re-projected under the rectified intrinsics (pure affine remap of gt:
    # x' maps to x = fx/fx'·(x'−cx') + cx), centre crop to dodge borders
    yy, xx = np.mgrid[:H, :W]
    gt = (((yy // 8) + (xx // 8)) % 2 * 255).astype(np.uint8)
    gt3 = np.stack([gt] * 3, -1)
    fxn, fyn = float(cam.fx), float(cam.fy)
    cxn, cyn = float(cam.cx), float(cam.cy)
    mx = (60.0 / fxn * (xx - cxn) + W / 2).astype(np.float32)
    my = (60.0 / fyn * (yy - cyn) + H / 2).astype(np.float32)
    expected = cv2.remap(gt3, mx, my, interpolation=cv2.INTER_LINEAR)
    got = cache.images[0][..., 0].astype(np.float64)
    sl = slice(16, 48)
    err = np.abs(got[sl, sl] - expected[sl, sl, 0]).mean()
    assert err < 20.0, err  # bilinear resampling blur only, no geometry error


def test_perspective_model_unchanged(tmp_path):
    _make_dataset(tmp_path)
    meta = json.loads((tmp_path / "transforms.json").read_text())
    meta["camera_model"] = "OPENCV"
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    parsed = parse_nerfstudio(tmp_path, split="train", eval_mode="all")
    assert parsed.camera_type == "perspective"
