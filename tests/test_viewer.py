"""Interactive viewer server: render loop, controls, painting over HTTP."""

import io
import json
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.train import optim, step as train_step
from gstex_tpu.viewer.server import Viewer

CFG = model.GStexConfig(chart_pad=(4, 4), tile_h=8, tile_w=16,
                        pair_cap=1 << 14, s_max=64, pixel_num=300,
                        background_color="black")
PORT = 17971


def _post(path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}",
        data=json.dumps(payload).encode(), method="POST")
    return json.loads(urllib.request.urlopen(req, timeout=120).read())


def _get(path):
    return urllib.request.urlopen(
        f"http://127.0.0.1:{PORT}{path}", timeout=120)


@pytest.fixture(scope="module")
def viewer():
    scene = random_scene(jax.random.key(2), 32, chart_pad=CFG.chart_pad)
    params, buffers = model.init_params(
        CFG, scene["means"], scene["log_scales"], scene["quats"],
        scene["opacity_logits"] + 2.0, scene["features_dc"],
        scene["features_rest"])
    state, _ = train_step.init_state(CFG, optim.OptimConfig(), params,
                                     buffers, jax.random.key(0))
    v = Viewer(CFG, lambda: state, port=PORT).start()
    yield v
    v.close()


def _camera_dict():
    cam = orbit_camera(64, 64, dist=3.0)
    return {"fx": float(cam.fx), "fy": float(cam.fy), "cx": float(cam.cx),
            "cy": float(cam.cy), "height": 64, "width": 64,
            "c2w": np.asarray(cam.c2w).tolist()}


def test_page_and_state(viewer):
    html = _get("/").read().decode()
    assert "gstex-tpu" in html and "Start Polyline" in html
    st = json.loads(_get("/state").read())
    assert st["num_gaussians"] == 32
    assert st["texel_count"] > 0


def test_render_roundtrip(viewer):
    _post("/render", {"camera": _camera_dict(), "output": "rgb"})
    jpeg = None
    for _ in range(100):
        r = _get("/frame")
        if r.status == 200:
            jpeg = r.read()
            break
        time.sleep(0.2)
    assert jpeg, "no frame produced"
    from PIL import Image

    img = np.array(Image.open(io.BytesIO(jpeg)))
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.std() > 1.0, "frame is blank"


def test_pause_resume(viewer):
    r = _post("/control", {"action": "pause"})
    assert r["paused"] is True
    r = _post("/control", {"action": "resume"})
    assert r["paused"] is False


def test_paint_over_http(viewer):
    cam = _camera_dict()
    _post("/control", {"action": "set_line", "rgb": [0, 255, 0], "width": 3})
    _post("/control", {"action": "start_polyline", "camera": cam})
    _post("/control", {"action": "click", "x": 0.4, "y": 0.4})
    r = _post("/control", {"action": "click", "x": 0.6, "y": 0.6})
    assert r["polyline"] == 2
    _post("/control", {"action": "end_polyline"})
    st = json.loads(_get("/state").read())
    assert st["edits"] == 1
    assert viewer.edit_texture is not None
    _post("/control", {"action": "undo"})
    st = json.loads(_get("/state").read())
    assert st["edits"] == 0
