"""Texture painting: polyline canvases → texel writes → edit overlay.

The headless core of the reference's texture-painting capability
(``GStexModel`` viewer hooks, ``gstex.py:379-606``): edits are (camera,
RGBA canvas) records; ``draw_from_view`` renders the current depth, opens a
±1e-2 window around it, scatters the canvas into texel space
(``texture_edit``), and lerps it into the working texture. Edits persist to
``edits/<ts>/{info.json,images/*.png}`` and can be re-imported
(``import_edit_json``, ``gstex.py:218-221,364-375``). The interactive viewer
(viewer/ package) drives this API.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import sh as sh_ops
from ..ops.binning import build_tile_bins
from ..ops.camera import Camera, make_camera
from ..ops.prepare import prepare_splats
from ..ops.rasterize import rasterize
from ..ops.texture_edit import apply_edit, texture_edit
from . import gstex as model

DEPTH_WINDOW = 1e-2  # gstex.py:568-569


def camera_to_json(cam: Camera) -> dict:
    """Persistable camera record (the role of ``Cameras.to_json``,
    ``cameras.py:947``)."""
    return {
        "fx": float(cam.fx), "fy": float(cam.fy),
        "cx": float(cam.cx), "cy": float(cam.cy),
        "height": int(cam.height), "width": int(cam.width),
        "c2w": np.asarray(cam.c2w).tolist(),
    }


def camera_from_json(d: dict) -> Camera:
    return make_camera(d["fx"], d["fy"], d["cx"], d["cy"], d["height"],
                       d["width"], np.array(d["c2w"], np.float32))


def draw_from_view(cfg: model.GStexConfig, params: model.GStexParams,
                   buffers: model.GStexBuffers, cam: Camera,
                   cur_texture_rgb: jax.Array, change_img: jax.Array):
    """One edit pass (``gstex.py:489-606``): depth window + canvas scatter.

    change_img: (H, W, 4) float RGBA canvas in [0,1].
    Returns the updated (N, Ch, Cw, 3) RGB texture.
    """
    prep = prepare_splats(
        params.means, params.log_scales, params.quats, params.opacity_logits,
        params.features_dc, params.features_rest, buffers.mappings, cam,
        active_sh_degree=cfg.sh_degree, sh_degree=cfg.sh_degree,
        fix_init=cfg.fix_init, extent_sigma=cfg.sigma_factor)
    grid = cfg.grid(cam.height, cam.width)
    bins = build_tile_bins(prep.centers, prep.extents, prep.depths, prep.valid,
                           grid, pair_cap=cfg.pair_cap, s_max=cfg.s_max)
    maps = rasterize(prep.geom, cur_texture_rgb, buffers.texture_hw, bins,
                     cam, grid)
    # α-normalized expected depth: the accumulated Σw·t under-estimates the
    # surface depth wherever α<1, which would make the ±1e-2 window miss
    # every splat on semi-transparent pixels (the reference edits trained
    # α≈1 scenes where the two coincide)
    depth = maps["depth"] / jnp.maximum(maps["alpha"], 1e-6)
    accum = texture_edit(
        prep.geom, params.texture.shape, buffers.texture_hw, bins, cam, grid,
        change_img[..., :3], change_img[..., 3:],
        depth - DEPTH_WINDOW, depth + DEPTH_WINDOW)
    return apply_edit(cur_texture_rgb, accum)


@dataclass
class EditSession:
    """Replayable edit stack (``edit_info`` + ``update_edit_texture``,
    ``gstex.py:363-437``)."""

    cfg: model.GStexConfig
    edits: list = field(default_factory=list)  # [{camera, canvas (H,W,4) u8}]

    def add_canvas(self, cam: Camera, canvas: np.ndarray):
        assert canvas.shape[-1] == 4
        self.edits.append({"camera": camera_to_json(cam),
                           "canvas": np.asarray(canvas, np.uint8)})

    def add_polyline(self, cam: Camera, points_px: list,
                     rgb=(255, 0, 0), width: int = 5):
        """Start a canvas and draw a polyline (``draw_edit_line``,
        ``gstex.py:483-487``)."""
        import cv2

        canvas = np.zeros((cam.height, cam.width, 4), np.uint8)
        pts = np.asarray(points_px, np.int32)
        cv2.polylines(canvas, [pts], False, tuple(rgb) + (255,), width)
        self.add_canvas(cam, canvas)

    def undo(self):
        if self.edits:
            self.edits.pop()

    def edit_texture(self, params, buffers) -> jax.Array:
        """Replay all edits onto SH2RGB(texture) (``update_edit_texture``)."""
        tex = sh_ops.sh_to_rgb(params.texture)
        for e in self.edits:
            cam = camera_from_json(e["camera"])
            change = jnp.asarray(e["canvas"], jnp.float32) / 255.0
            tex = draw_from_view(self.cfg, params, buffers, cam, tex, change)
        return tex

    def save(self, out_dir) -> Path:
        """Persist to edits/<ts>/ (``handle_save``, ``gstex.py:404-419``)."""
        from PIL import Image

        ts = time.strftime("%Y-%m-%d_%H%M%S")
        root = Path(out_dir) / ts
        (root / "images").mkdir(parents=True, exist_ok=True)
        info = []
        for i, e in enumerate(self.edits):
            fname = root / "images" / f"edit_{i:04d}.png"
            Image.fromarray(e["canvas"]).save(fname)
            info.append({"camera": e["camera"], "file": str(fname)})
        (root / "info.json").write_text(json.dumps(info))
        return root

    @classmethod
    def load(cls, cfg, info_json_path) -> "EditSession":
        """Re-import edits (``import_edit_json``, ``gstex.py:364-375``)."""
        from PIL import Image

        sess = cls(cfg)
        info = json.loads(Path(info_json_path).read_text())
        for e in info:
            canvas = np.array(Image.open(e["file"]))
            sess.edits.append({"camera": e["camera"], "canvas": canvas})
        return sess
