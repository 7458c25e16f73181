"""Nerfstudio dataparser pose preprocessing + eval modes.

Covers the reference parser's normalization surface
(``nerfstudio_dataparser.py:50-73,236-254``): auto-orientation (up/pca/
vertical), centering (poses/focus), auto-scaling, eval_mode=filename, the
recorded dataparser transform/scale, and seed-point consistency.
"""

import json

import numpy as np
import pytest

from gstex_tpu.data.pose_utils import (auto_orient_and_center_poses,
                                       focus_of_attention,
                                       rotation_matrix_between,
                                       split_by_filename)


def _look_at(origin, target, up=(0, 0, 1)):
    """OpenGL c2w: camera looks along -z, +y up."""
    origin = np.asarray(origin, float)
    fwd = target - origin
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, float))
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -fwd
    c2w[:3, 3] = origin
    return c2w


def _ring_poses(center=(0.5, -0.3, 1.2), radius=3.0, n=8, tilt=0.4):
    center = np.asarray(center)
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / n
        o = center + radius * np.array(
            [np.cos(a), np.sin(a), 0.6 + 0.1 * np.sin(2 * a)])
        # tilt the world so "up" is not z: rotate everything about x
        poses.append(_look_at(o, center))
    R = rotation_matrix_between(np.array([0.0, 0.0, 1.0]),
                                np.array([np.sin(tilt), 0, np.cos(tilt)]))
    T = np.eye(4)
    T[:3, :3] = R
    return np.stack([T @ p for p in poses])


def test_rotation_matrix_between():
    a = np.array([0.3, -0.4, 0.9])
    b = np.array([0.0, 0.0, 1.0])
    R = rotation_matrix_between(a, b)
    np.testing.assert_allclose(R @ (a / np.linalg.norm(a)), b, atol=1e-12)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    # opposite vectors still produce a valid rotation
    R2 = rotation_matrix_between(np.array([0, 0, -1.0]), b)
    np.testing.assert_allclose(np.linalg.det(R2), 1.0, atol=1e-6)
    np.testing.assert_allclose(R2 @ np.array([0, 0, -1.0]), b, atol=0.02)


def test_orient_up_centers_and_aligns():
    poses = _ring_poses()
    oriented, tf = auto_orient_and_center_poses(poses, "up", "poses")
    assert oriented.shape == (8, 3, 4)
    assert tf.shape == (3, 4)
    # transform actually maps input poses to output
    np.testing.assert_allclose(tf @ poses, oriented, atol=1e-12)
    # mean origin at 0, mean up along +z
    np.testing.assert_allclose(oriented[:, :3, 3].mean(0), 0, atol=1e-9)
    up = oriented[:, :3, 1].mean(0)
    up /= np.linalg.norm(up)
    np.testing.assert_allclose(up, [0, 0, 1], atol=1e-9)


def test_center_focus_recovers_look_at_point():
    center = np.array([0.5, -0.3, 1.2])
    poses = []
    for i in range(8):
        a = 2 * np.pi * i / 8
        o = center + 3.0 * np.array([np.cos(a), np.sin(a), 0.5])
        poses.append(_look_at(o, center))
    poses = np.stack(poses)
    focus = focus_of_attention(poses, poses[:, :3, 3].mean(0))
    np.testing.assert_allclose(focus, center, atol=1e-8)
    oriented, _ = auto_orient_and_center_poses(poses, "none", "focus")
    # the focus point moves to the origin
    origs = oriented[:, :3, 3]
    d = np.linalg.norm(origs, axis=-1)
    np.testing.assert_allclose(d, 3.0 * np.sqrt(1 + 0.25), rtol=1e-6)


@pytest.mark.parametrize("method", ["pca", "vertical"])
def test_orient_methods_produce_valid_rotations(method):
    poses = _ring_poses()
    oriented, tf = auto_orient_and_center_poses(poses, method, "poses")
    R = tf[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    np.testing.assert_allclose(tf @ poses, oriented, atol=1e-12)


def test_split_by_filename():
    tr, ev = split_by_filename(["train_0.png", "eval_0.png", "train_1.png"])
    assert tr.tolist() == [0, 2] and ev.tolist() == [1]
    with pytest.raises(ValueError):
        split_by_filename(["other.png"])


def _write_dataset(root, n=6):
    from PIL import Image

    (root / "images").mkdir()
    img = np.zeros((8, 8, 3), np.uint8)
    frames = []
    poses = _ring_poses(n=n)
    for i in range(n):
        name = f"images/frame_{i:03d}.png"
        Image.fromarray(img).save(root / name)
        frames.append({"file_path": name,
                       "transform_matrix": poses[i].tolist()})
    meta = {"camera_model": "OPENCV",
            "fl_x": 10.0, "fl_y": 10.0, "cx": 4.0, "cy": 4.0,
            "w": 8, "h": 8, "frames": frames}
    (root / "transforms.json").write_text(json.dumps(meta))
    return poses


def test_parse_nerfstudio_pose_normalization(tmp_path):
    from gstex_tpu.data.nerfstudio_parser import parse_nerfstudio

    poses = _write_dataset(tmp_path)
    parsed = parse_nerfstudio(tmp_path, eval_mode="all",
                              orientation_method="up",
                              center_method="poses",
                              auto_scale_poses=True, scale_factor=2.0,
                              load_3d_points=False)
    # defaults record identity; here a real transform + scale
    assert parsed.dataparser_transform is not None
    assert parsed.dataparser_scale != 1.0
    # auto-scale: max |origin| == scale_factor
    mx = np.max(np.abs(parsed.c2ws[:, :3, 3]))
    np.testing.assert_allclose(mx, 2.0, rtol=1e-5)
    # c2ws = scale(transform @ poses)  (frames sorted by file_path = order)
    tf = parsed.dataparser_transform.astype(np.float64)
    expect = np.einsum("ij,njk->nik", tf[:, :3], poses[:, :3, :4])
    expect[:, :, 3] += tf[:, 3]
    expect[:, :, 3] *= parsed.dataparser_scale
    np.testing.assert_allclose(parsed.c2ws, expect.astype(np.float32),
                               atol=1e-5)

    # save round-trips
    parsed.save_dataparser_transform(tmp_path / "out" / "dataparser_transforms.json")
    data = json.loads((tmp_path / "out" / "dataparser_transforms.json").read_text())
    np.testing.assert_allclose(np.array(data["transform"]),
                               parsed.dataparser_transform, atol=1e-7)
    assert data["scale"] == parsed.dataparser_scale


def test_parse_nerfstudio_defaults_are_identity(tmp_path):
    from gstex_tpu.data.nerfstudio_parser import parse_nerfstudio

    poses = _write_dataset(tmp_path)
    parsed = parse_nerfstudio(tmp_path, eval_mode="all",
                              load_3d_points=False)
    np.testing.assert_allclose(parsed.c2ws, poses[:, :3, :4], atol=1e-6)
    np.testing.assert_allclose(parsed.dataparser_transform,
                               np.eye(4)[:3], atol=0)
    assert parsed.dataparser_scale == 1.0


def test_parse_nerfstudio_filename_split(tmp_path):
    from PIL import Image

    from gstex_tpu.data.nerfstudio_parser import parse_nerfstudio

    (tmp_path / "images").mkdir()
    img = np.zeros((8, 8, 3), np.uint8)
    frames = []
    for i, tag in enumerate(["train", "train", "eval", "train"]):
        name = f"images/{tag}_{i:02d}.png"
        Image.fromarray(img).save(tmp_path / name)
        c2w = np.eye(4)
        c2w[2, 3] = float(i)
        frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
    meta = {"camera_model": "OPENCV", "fl_x": 10.0, "fl_y": 10.0,
            "cx": 4.0, "cy": 4.0, "w": 8, "h": 8, "frames": frames}
    (tmp_path / "transforms.json").write_text(json.dumps(meta))

    tr = parse_nerfstudio(tmp_path, split="train", eval_mode="filename",
                          load_3d_points=False)
    ev = parse_nerfstudio(tmp_path, split="val", eval_mode="filename",
                          load_3d_points=False)
    assert len(tr.image_filenames) == 3
    assert len(ev.image_filenames) == 1
    assert "eval" in ev.image_filenames[0].name
