"""PLY / npz / checkpoint IO round trips."""

import jax
import jax.numpy as jnp
import numpy as np

from gstex_tpu.data.synthetic import random_scene
from gstex_tpu.models import gstex as model, init_io
from gstex_tpu.train import optim, step as train_step
from gstex_tpu.utils import checkpoint as ckpt_io
from gstex_tpu.utils import ply as ply_io

CFG = model.GStexConfig(chart_pad=(4, 4), pixel_num=300)


def _params(n=16):
    scene = random_scene(jax.random.key(0), n, chart_pad=CFG.chart_pad)
    return model.init_params(
        CFG, scene["means"], scene["log_scales"], scene["quats"],
        scene["opacity_logits"], scene["features_dc"], scene["features_rest"])


def test_ply_roundtrip(tmp_path):
    params, buffers = _params()
    path = tmp_path / "g.ply"
    init_io.export_gaussian_ply(path, params, buffers)
    raw = init_io.raw_from_gaussian_ply(path)
    np.testing.assert_allclose(np.asarray(raw["means"]),
                               np.asarray(params.means), atol=1e-6)
    np.testing.assert_allclose(np.asarray(raw["quats"]),
                               np.asarray(params.quats), atol=1e-6)
    np.testing.assert_allclose(np.asarray(raw["features_rest"]),
                               np.asarray(params.features_rest), atol=1e-6)
    np.testing.assert_allclose(np.asarray(raw["log_scales"]),
                               np.asarray(params.log_scales), atol=1e-6)


def test_point_ply_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
    cols = np.random.default_rng(1).uniform(0, 255, (10, 3)).astype(np.float32)
    ply_io.write_ply(tmp_path / "p.ply", {
        "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
        "red": cols[:, 0], "green": cols[:, 1], "blue": cols[:, 2]})
    p2, c2 = ply_io.read_point_ply(tmp_path / "p.ply")
    np.testing.assert_allclose(p2, pts, atol=1e-6)
    np.testing.assert_allclose(c2, cols, atol=1e-4)


def test_npz_export(tmp_path):
    params, buffers = _params()
    init_io.export_npz(tmp_path / "m.npz", params, buffers)
    d = np.load(tmp_path / "m.npz")
    hw = np.asarray(buffers.texture_hw)
    assert d["texture_dc"].shape[0] == int((hw[:, 0] * hw[:, 1]).sum())
    assert d["texture_dims"].shape == (16, 3)
    # offsets are the exclusive cumsum of h*w (jagged_texture layout)
    hws = d["texture_dims"][:, 0] * d["texture_dims"][:, 1]
    np.testing.assert_array_equal(d["texture_dims"][:, 2],
                                  np.cumsum(hws) - hws)


def test_checkpoint_roundtrip(tmp_path):
    params, buffers = _params()
    state, tx = train_step.init_state(CFG, optim.OptimConfig(), params,
                                      buffers, jax.random.key(5))
    state = state._replace(step=jnp.int32(123))
    path = ckpt_io.save_checkpoint(tmp_path, state)
    assert path.name == "step-000000123.ckpt.npz"
    state2, _ = train_step.init_state(CFG, optim.OptimConfig(), params,
                                      buffers, jax.random.key(0))
    restored = ckpt_io.load_checkpoint(path, state2)
    assert int(restored.step) == 123
    np.testing.assert_array_equal(np.asarray(restored.params.means),
                                  np.asarray(state.params.means))
    # rng key restored
    k1 = jax.random.key_data(restored.key)
    k2 = jax.random.key_data(state.key)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_average_chart_colors():
    params, buffers = _params()
    avg = init_io.average_chart_colors(params.texture, buffers.texture_hw)
    assert avg.shape == (16, 3)
    # manual check for gaussian 0
    hw = np.asarray(buffers.texture_hw)
    from gstex_tpu.ops.sh import sh_to_rgb
    t0 = np.asarray(sh_to_rgb(params.texture[0]))[:hw[0, 0], :hw[0, 1]]
    np.testing.assert_allclose(np.asarray(avg[0]), t0.mean((0, 1)), rtol=1e-5)


def test_knn_scale_init():
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    d = init_io.knn_mean_dist(pts, k=3)
    expected0 = (1 + 1 + 1) / 3
    np.testing.assert_allclose(d[0], expected0, rtol=1e-5)


def test_read_pcd_ascii_and_binary(tmp_path):
    """Dependency-free .pcd reader (reference load_from_file, gstex.py:697
    reads pcd init files via open3d)."""
    import struct

    from gstex_tpu.utils.ply import read_pcd

    pts = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0],
                    [-1.0, -2.0, -3.0]], np.float32)
    rgb = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    packed = ((rgb[:, 0].astype(np.uint32) << 16)
              | (rgb[:, 1].astype(np.uint32) << 8)
              | rgb[:, 2].astype(np.uint32))
    packed_f = packed.view(np.float32)

    hdr = ("VERSION 0.7\nFIELDS x y z rgb\nSIZE 4 4 4 4\n"
           "TYPE F F F F\nCOUNT 1 1 1 1\nWIDTH 3\nHEIGHT 1\n"
           "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS 3\n")
    # ascii (rgb as the uint-valued float PCL writes)
    a = tmp_path / "a.pcd"
    lines = [f"{p[0]} {p[1]} {p[2]} {float(pf)}"
             for p, pf in zip(pts, packed.astype(np.float64))]
    a.write_text(hdr + "DATA ascii\n" + "\n".join(lines) + "\n")
    p_a, c_a = read_pcd(a)
    np.testing.assert_allclose(p_a, pts)
    np.testing.assert_allclose(c_a, rgb.astype(np.float32))
    # binary (rgb packed into the float's bit pattern, the common layout)
    b = tmp_path / "b.pcd"
    rows = b"".join(struct.pack("<ffff", *p, pf)
                    for p, pf in zip(pts, packed_f))
    b.write_bytes((hdr + "DATA binary\n").encode() + rows)
    p_b, c_b = read_pcd(b)
    np.testing.assert_allclose(p_b, pts)
    np.testing.assert_allclose(c_b, rgb.astype(np.float32))
    # colorless file falls back to gray
    c = tmp_path / "c.pcd"
    c.write_text("FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
                 "WIDTH 2\nHEIGHT 1\nPOINTS 2\nDATA ascii\n"
                 "0 0 0\n1 1 1\n")
    p_c, c_c = read_pcd(c)
    assert p_c.shape == (2, 3) and (c_c == 127.0).all()
    # the init path consumes it
    from gstex_tpu.models import init_io

    raw = init_io.raw_from_points(p_b, c_b, sh_degree=1)
    assert raw["means"].shape == (3, 3)


def test_export_npz_roundtrip(tmp_path):
    """params_from_export_npz inverts export_npz (the bench --scene-npz /
    trained-statistics scene source)."""
    import jax

    from gstex_tpu.data.synthetic import random_scene
    from gstex_tpu.models import gstex as model
    from gstex_tpu.models import init_io

    cfg = model.GStexConfig(chart_pad=(8, 8))
    s = random_scene(jax.random.key(0), 50, chart_pad=cfg.chart_pad)
    p, b = model.init_params(cfg, s["means"], s["log_scales"], s["quats"],
                             s["opacity_logits"], s["features_dc"],
                             s["features_rest"])
    p = p._replace(texture=jax.random.normal(jax.random.key(1),
                                             p.texture.shape))
    path = tmp_path / "dump.npz"
    init_io.export_npz(path, p, b)
    p2, b2 = init_io.params_from_export_npz(cfg, path)
    hw = np.asarray(b.texture_hw)
    for i in range(50):
        h, w = hw[i]
        np.testing.assert_allclose(np.asarray(p.texture)[i, :h, :w],
                                   np.asarray(p2.texture)[i, :h, :w],
                                   atol=1e-6)
    np.testing.assert_allclose(np.asarray(p.means), np.asarray(p2.means))
    np.testing.assert_allclose(np.asarray(p.log_scales),
                               np.asarray(p2.log_scales))
    np.testing.assert_allclose(np.asarray(b.mappings),
                               np.asarray(b2.mappings))
