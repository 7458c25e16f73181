"""gstex-render CLI — the ``ns-render`` equivalent.

Mirrors ``nerfstudio/scripts/render.py`` subcommands: ``dataset`` (render
train/eval views), ``interpolate`` (spline between dataset cameras),
``spiral`` (orbit around the dataset center). Outputs PNG frames and an
optional mp4 (cv2 VideoWriter).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def _interp_poses(c2ws, steps):
    """Linear position + slerp-ish rotation interpolation between cameras."""
    from scipy.spatial.transform import Rotation, Slerp

    n = len(c2ws)
    times = np.arange(n)
    rots = Rotation.from_matrix(np.stack([c[:3, :3] for c in c2ws]))
    slerp = Slerp(times, rots)
    t_new = np.linspace(0, n - 1, steps)
    r_new = slerp(t_new).as_matrix()
    pos = np.stack([c[:3, 3] for c in c2ws])
    p_new = np.stack([np.interp(t_new, times, pos[:, i]) for i in range(3)], 1)
    return [np.concatenate([r_new[i], p_new[i][:, None]], 1)
            for i in range(steps)]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["dataset", "interpolate", "spiral",
                                    "camera-path"])
    p.add_argument("--load-config", required=True)
    p.add_argument("--camera-path-filename", default=None,
                   help="nerfstudio camera_path.json (mode=camera-path)")
    p.add_argument("--output-path", default="renders")
    p.add_argument("--split", default="test")
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--video", action="store_true")
    p.add_argument("--camera-type", default="perspective",
                   choices=["perspective", "equirectangular", "ods"],
                   help="equirectangular/ods render panoramas at each "
                        "pose via cubemap faces (ops/pano.py; reference "
                        "cameras.py:805-816 camera types)")
    p.add_argument("--pano-width", type=int, default=2048,
                   help="panorama width (height = width/2)")
    p.add_argument("--ipd", type=float, default=0.064,
                   help="ODS inter-pupillary distance (world units)")
    args = p.parse_args(argv)

    from .eval_setup import eval_setup

    run_dir = Path(args.load_config)
    if run_dir.name == "config.json":
        run_dir = run_dir.parent
    trainer, method, _ = eval_setup(run_dir)

    cache = trainer.eval_cache if args.split == "test" else trainer.train_cache
    if cache is None:
        cache = trainer.train_cache
    cams = cache.cameras

    if args.mode == "dataset":
        cam_list = cams
    elif args.mode == "camera-path":
        # keyframed path JSON from the viewer's render panel
        # (reference render_panel.py -> scripts/render.py:433 RenderCameraPath)
        import json as _json

        from ..ops.camera import make_camera

        spec = _json.loads(Path(args.camera_path_filename).read_text())
        h = int(spec.get("render_height", 1080))
        w = int(spec.get("render_width", 1920))
        cam_list = []
        for kf in spec["camera_path"]:
            c2w = np.array(kf["camera_to_world"], np.float64).reshape(4, 4)[:3]
            fov_deg = float(kf.get("fov", spec.get("fov", 50.0)))
            fy = 0.5 * h / np.tan(0.5 * np.deg2rad(fov_deg))
            cam_list.append(make_camera(fy, fy, w / 2, h / 2, h, w, c2w))
    else:
        from ..ops.camera import make_camera

        base = cams[0]
        c2ws = [np.asarray(c.c2w) for c in cams]
        if args.mode == "interpolate":
            poses = _interp_poses(c2ws, args.frames)
        else:  # spiral around the mean camera distance
            center = np.mean([c[:3, 3] for c in c2ws], axis=0)
            radius = float(np.linalg.norm(center) + 1e-3) or 4.0
            poses = []
            from ..data.synthetic import orbit_camera

            for az in np.linspace(0, 2 * np.pi, args.frames, endpoint=False):
                oc = orbit_camera(base.height, base.width, dist=radius,
                                  azimuth=float(az))
                poses.append(np.asarray(oc.c2w))
        cam_list = [make_camera(base.fx, base.fy, base.cx, base.cy,
                                base.height, base.width, pose)
                    for pose in poses]

    out_dir = Path(args.output_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    bg = trainer._eval_background()
    writer = None
    from PIL import Image

    for i, cam in enumerate(cam_list):
        if args.camera_type != "perspective":
            from ..ops import pano

            render_one = lambda c: trainer._eval(trainer.state, c,
                                                 bg)["rgb"]
            w = args.pano_width
            h = w // 2
            if args.camera_type == "equirectangular":
                img = pano.render_equirect(render_one, np.asarray(cam.c2w),
                                           h, w)
            else:
                img = pano.render_ods(render_one, np.asarray(cam.c2w), h,
                                      w, ipd=args.ipd)
            rgb = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
        else:
            out = trainer._eval(trainer.state, cam, bg)
            rgb = (np.clip(np.asarray(out["rgb"]), 0, 1)
                   * 255).astype(np.uint8)
        Image.fromarray(rgb).save(out_dir / f"frame_{i:05d}.png")
        if args.video:
            import cv2

            if writer is None:
                writer = cv2.VideoWriter(
                    str(out_dir / "render.mp4"),
                    cv2.VideoWriter_fourcc(*"mp4v"), args.fps,
                    (rgb.shape[1], rgb.shape[0]))
            writer.write(cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
    if writer is not None:
        writer.release()
    print(f"wrote {len(cam_list)} frames to {out_dir}")


if __name__ == "__main__":
    main()
