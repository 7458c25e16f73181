"""Blender synthetic dataset parser (transforms_{split}.json).

Mirrors the reference Blender dataparser
(``nerfstudio/data/dataparsers/blender_dataparser.py:48-105``): fov→focal via
``camera_angle_x``, principal point at the image center, poses used as given
(OpenGL c2w), scene scale_factor on camera origins, RGBA images composited
over the alpha color downstream.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

import numpy as np


@dataclass
class ParsedDataset:
    image_filenames: list
    c2ws: np.ndarray      # (M,3,4) float32
    fx: np.ndarray        # (M,)
    fy: np.ndarray
    cx: np.ndarray
    cy: np.ndarray
    heights: np.ndarray   # (M,) int
    widths: np.ndarray
    points_xyz: np.ndarray | None = None   # (P,3) seed points
    points_rgb: np.ndarray | None = None   # (P,3) 0-255
    mask_filenames: list | None = None     # per-frame binary masks
    # pose normalization applied by the parser (reference
    # base_dataparser.py:68-71); identity unless the parser reorients/rescales
    dataparser_transform: np.ndarray | None = None  # (3,4)
    dataparser_scale: float = 1.0

    def save_dataparser_transform(self, path):
        """Persist the applied transform+scale for reproducible coordinate
        frames (reference ``base_dataparser.py:77-91``, saved by the trainer
        at ``engine/trainer.py:214-216``)."""
        import json as _json
        from pathlib import Path as _Path

        tf = (self.dataparser_transform if self.dataparser_transform
              is not None else np.eye(4)[:3])
        path = _Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(_json.dumps(
            {"transform": np.asarray(tf).tolist(),
             "scale": float(self.dataparser_scale)}, indent=4))


def _image_size(path: Path) -> tuple[int, int]:
    from PIL import Image

    with Image.open(path) as im:
        return im.height, im.width


def parse_blender(data_dir, split: str = "train",
                  scale_factor: float = 1.0) -> ParsedDataset:
    data_dir = Path(data_dir)
    meta = json.loads((data_dir / f"transforms_{split}.json").read_text())
    filenames, poses = [], []
    for frame in meta["frames"]:
        fname = data_dir / (frame["file_path"].replace("./", "") + ".png")
        filenames.append(fname)
        poses.append(np.array(frame["transform_matrix"], np.float32))
    poses = np.stack(poses)[:, :3, :4]
    poses[:, :, 3] *= scale_factor

    h, w = _image_size(filenames[0])
    focal = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))
    m = len(filenames)
    return ParsedDataset(
        image_filenames=filenames,
        c2ws=poses,
        fx=np.full(m, focal, np.float32),
        fy=np.full(m, focal, np.float32),
        cx=np.full(m, w / 2.0, np.float32),
        cy=np.full(m, h / 2.0, np.float32),
        heights=np.full(m, h, np.int64),
        widths=np.full(m, w, np.int64),
    )
