"""Texture painting (texture_edit) and eval extra renders."""

import jax
import jax.numpy as jnp
import numpy as np

from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.models import editing, gstex as model
from gstex_tpu.ops import sh as sh_ops

CFG = model.GStexConfig(chart_pad=(4, 4), tile_h=8, tile_w=16,
                        pair_cap=1 << 14, s_max=64, pixel_num=300,
                        background_color="black")
H, W = 48, 64


def setup(n=40):
    scene = random_scene(jax.random.key(4), n, chart_pad=CFG.chart_pad)
    params, buffers = model.init_params(
        CFG, scene["means"], scene["log_scales"], scene["quats"],
        scene["opacity_logits"] + 2.0, scene["features_dc"],
        scene["features_rest"])
    cam = orbit_camera(H, W, dist=3.0)
    return params, buffers, cam


def test_paint_changes_visible_texels():
    params, buffers, cam = setup()
    cur = sh_ops.sh_to_rgb(params.texture)
    # paint the center region bright red with full alpha
    canvas = np.zeros((H, W, 4), np.float32)
    canvas[H // 2 - 8:H // 2 + 8, W // 2 - 12:W // 2 + 12] = [1, 0, 0, 1]
    new = editing.draw_from_view(CFG, params, buffers, cam, cur,
                                 jnp.asarray(canvas))
    diff = np.abs(np.asarray(new) - np.asarray(cur)).max(axis=(1, 2, 3))
    assert (diff > 0.05).any(), "no texels changed"
    # painted texels move toward red: red channel increases most
    delta = np.asarray(new) - np.asarray(cur)
    changed = delta.reshape(-1, 3)[np.abs(delta).reshape(-1, 3).max(1) > 0.05]
    assert changed[:, 0].mean() > 0, "red channel did not increase"

    # re-render with the edited texture: image gets redder in the center
    out_old = model.render(CFG, params, buffers, cam, jnp.int32(0),
                           jnp.zeros(3))
    prep_params = params._replace(texture=sh_ops.rgb_to_sh(new))
    out_new = model.render(CFG, prep_params, buffers, cam, jnp.int32(0),
                           jnp.zeros(3))
    center = (slice(H // 2 - 8, H // 2 + 8), slice(W // 2 - 12, W // 2 + 12))
    red_gain = float((out_new["rgb"][center][..., 0]
                      - out_old["rgb"][center][..., 0]).mean())
    assert red_gain > 0.01, red_gain


def test_empty_canvas_noop():
    params, buffers, cam = setup()
    cur = sh_ops.sh_to_rgb(params.texture)
    canvas = jnp.zeros((H, W, 4))
    new = editing.draw_from_view(CFG, params, buffers, cam, cur, canvas)
    np.testing.assert_allclose(np.asarray(new), np.asarray(cur), atol=1e-5)


def test_edit_session_roundtrip(tmp_path):
    params, buffers, cam = setup(n=24)
    sess = editing.EditSession(CFG)
    sess.add_polyline(cam, [(10, 10), (40, 30), (50, 40)],
                      rgb=(0, 255, 0), width=4)
    tex1 = sess.edit_texture(params, buffers)
    root = sess.save(tmp_path)
    sess2 = editing.EditSession.load(CFG, root / "info.json")
    tex2 = sess2.edit_texture(params, buffers)
    np.testing.assert_allclose(np.asarray(tex1), np.asarray(tex2), atol=1e-6)
    sess2.undo()
    assert len(sess2.edits) == 0


def test_eval_images():
    params, buffers, cam = setup()
    imgs = model.render_eval_images(CFG, params, buffers, cam,
                                    jnp.int32(3000), jnp.zeros(3))
    for k in ["rgb", "test", "uv", "edit", "clean_normal_img", "only_rgb",
              "only_texture"]:
        assert imgs[k].shape == (H, W, 3), k
        assert np.isfinite(np.asarray(imgs[k])).all(), k
    # the test render is made of the random test colors — nontrivial
    assert float(imgs["test"].std()) > 0.01


def test_depth_to_normal_plane():
    # a fronto-parallel plane at depth 2 -> normals along the view axis
    from gstex_tpu.ops.normals import depth_to_normal

    cam = orbit_camera(32, 32, dist=4.0, azimuth=0.0, elevation=0.0)
    depth = jnp.full((32, 32), 2.0)
    n = np.asarray(depth_to_normal(depth, cam))
    inner = n[8:-8, 8:-8]
    # unit normals, consistently oriented along ±z (view direction)
    norms = np.linalg.norm(inner, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    assert np.abs(inner[..., 2]).min() > 0.99
