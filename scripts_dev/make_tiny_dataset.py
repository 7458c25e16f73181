"""Generate a tiny on-disk Blender-format dataset (oracle-rendered) for
driving the CLI pipeline without real Blender/DTU data."""
import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.models import init_io

H = W = 64
root = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny_blender")
root.mkdir(parents=True, exist_ok=True)

cfg = model.GStexConfig(chart_pad=(4, 4), tile_h=8, tile_w=16,
                        pair_cap=1 << 14, s_max=64, pixel_num=400,
                        background_color="white")
scene = random_scene(jax.random.key(11), 40, chart_pad=(4, 4))
params, buffers = model.init_params(
    cfg, scene["means"], scene["log_scales"], scene["quats"],
    scene["opacity_logits"] + 2.0, scene["features_dc"],
    scene["features_rest"] * 0.0)

for split, n_views, off in [("train", 8, 0.0), ("test", 2, 0.3)]:
    (root / split).mkdir(exist_ok=True)
    frames = []
    for i in range(n_views):
        az = 2 * np.pi * (i + off) / n_views
        cam = orbit_camera(H, W, dist=3.5, azimuth=az)
        out = model.render(cfg, params, buffers, cam, step=jnp.int32(0),
                           background=jnp.ones(3))
        img = (np.clip(np.asarray(out["rgb"]), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / split / f"r_{i}.png")
        c2w4 = np.eye(4)
        c2w4[:3] = np.asarray(cam.c2w)
        frames.append({"file_path": f"./{split}/r_{i}",
                       "transform_matrix": c2w4.tolist()})
    meta = {"camera_angle_x": 2 * float(np.arctan(0.5 * W / float(cam.fx))),
            "frames": frames}
    (root / f"transforms_{split}.json").write_text(json.dumps(meta))

init_io.export_gaussian_ply(root / "init.ply", params, buffers)
print("dataset at", root)
