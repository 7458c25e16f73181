"""Experiment sweep runner — the ``scripts/{blender,dtu}_{nvs,lod}.py`` analog.

Mirrors the reference ``ExperimentRunner`` (``scripts/utils.py:10-81``):
trains + evals every scene of a sweep via the CLIs, logging commands and
abridged metrics {psnr, ssim, lpips, gaussian_count, texel_count,
pixel_scale, fps} to ``log.json``.

  python -m gstex_tpu.scripts.experiments blender-nvs --data-root /data/blender
  python -m gstex_tpu.scripts.experiments blender-lod --data-root /data/blender
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

BLENDER_SCENES = ["chair", "drums", "ficus", "hotdog", "lego", "materials",
                  "mic", "ship"]
DTU_SCANS = [24, 37, 40, 55, 63, 65, 69, 83, 97, 105, 106, 110, 114, 118, 122]
LOD_SIZES = [128, 512, 2048, 8192, 32768]  # blender_lod.py:26 / dtu_lod.py:25

KEEP_KEYS = ["psnr", "ssim", "lpips", "gaussian_count", "texel_count",
             "pixel_scale", "fps"]


def run_one(method, data, out_dir, extra_args, log):
    cmd = [sys.executable, "-m", "gstex_tpu.scripts.train", method,
           "--data", str(data), "--output-dir", str(out_dir)] + extra_args
    log["commands"].append(" ".join(cmd))
    t0 = time.time()
    subprocess.run(cmd, check=True)
    entry = {"data": str(data), "train_s": round(time.time() - t0, 1)}
    eval_json = Path(out_dir) / "eval.json"
    if eval_json.exists():
        results = json.loads(eval_json.read_text())
        entry.update({k: results[k] for k in KEEP_KEYS if k in results})
    log["runs"].append(entry)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sweep", choices=["blender-nvs", "dtu-nvs", "blender-lod",
                                     "dtu-lod"])
    p.add_argument("--data-root", required=True)
    p.add_argument("--init-root", default=None,
                   help="root holding <scene>/init_nvs/point_cloud.ply")
    p.add_argument("--output-root", default="outputs/experiments")
    p.add_argument("--scenes", nargs="*", default=None)
    p.add_argument("--train-args", nargs=argparse.REMAINDER, default=[],
                   help="extra flags passed through to every gstex-train "
                        "invocation (e.g. --train-args --max-num-iterations "
                        "100 --renderer pallas)")
    args = p.parse_args(argv)

    root = Path(args.data_root)
    out_root = Path(args.output_root) / args.sweep
    out_root.mkdir(parents=True, exist_ok=True)
    log = {"commands": [], "runs": []}

    blender = args.sweep.startswith("blender")
    scenes = args.scenes or (BLENDER_SCENES if blender
                             else [f"scan{s}" for s in DTU_SCANS])
    nvs = args.sweep.endswith("nvs")
    method = (("gstex-blender-nvs" if blender else "gstex-dtu-nvs") if nvs
              else ("gstex-blender-lod" if blender else "gstex-dtu-lod"))

    for scene in scenes:
        data = root / scene
        init_root = Path(args.init_root) if args.init_root else data
        if nvs:
            extra = list(args.train_args)
            ply = init_root / "init_nvs" / "point_cloud.ply"
            if ply.exists():
                extra += ["--init-ply", str(ply)]
            run_one(method, data, out_root / scene, extra, log)
        else:
            for size in LOD_SIZES:
                ply = init_root / "init_lod" / f"pc_{size}.ply"
                extra = (["--init-lod-ply", str(ply)] if ply.exists()
                         else ["--num-random", str(size)])
                extra += list(args.train_args)
                run_one(method, data, out_root / f"{scene}_{size}", extra, log)
        (out_root / "log.json").write_text(json.dumps(log, indent=2))

    print(json.dumps(log["runs"], indent=2))


if __name__ == "__main__":
    main()
