"""gstex-train CLI — the ``ns-train`` equivalent.

Mirrors the reference entry (``nerfstudio/scripts/train.py``): pick a method
config, point at data, optionally an init ply, train, save config + ckpts.

Example:
    gstex-train gstex-blender-nvs --data /data/blender/chair \\
        --init-ply /data/blender/chair/init_nvs/point_cloud.ply
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path

import numpy as np


def build_dataset(method, data_dir, split):
    if method.dataparser == "blender":
        from ..data.blender import parse_blender

        return parse_blender(data_dir, split=split)
    from ..data.nerfstudio_parser import parse_nerfstudio

    return parse_nerfstudio(
        data_dir, split=split, downscale_factor=method.downscale_factor,
        eval_mode=method.eval_mode, eval_interval=method.eval_interval)


def build_model(args, method, parsed):
    import jax

    from ..models import gstex as model
    from ..models import init_io

    mcfg = method.model
    if args.init_ply:
        raw = init_io.raw_from_gaussian_ply(args.init_ply,
                                            sh_degree=mcfg.sh_degree,
                                            fix_init=mcfg.fix_init)
    elif args.init_npz:
        raw = init_io.raw_from_npz(args.init_npz)
    elif args.init_lod_ply:
        from ..utils.ply import read_point_ply

        pts, cols = read_point_ply(args.init_lod_ply)
        raw = init_io.raw_from_points(pts, cols, sh_degree=mcfg.sh_degree,
                                      fix_init_pts=mcfg.fix_init)
    elif args.init_pcd:
        # open3d pcd init (``load_from_file``, reference gstex.py:697)
        from ..utils.ply import read_pcd

        pts, cols = read_pcd(args.init_pcd)
        raw = init_io.raw_from_points(pts, cols, sh_degree=mcfg.sh_degree,
                                      fix_init_pts=mcfg.fix_init)
    elif parsed.points_xyz is not None:
        raw = init_io.raw_from_points(parsed.points_xyz, parsed.points_rgb,
                                      sh_degree=mcfg.sh_degree,
                                      fix_init_pts=mcfg.fix_init)
    else:
        raw = init_io.raw_random(args.num_random, sh_degree=mcfg.sh_degree)
    return model.init_params(
        mcfg, raw["means"], raw["log_scales"], raw["quats"],
        raw["opacity_logits"], raw["features_dc"], raw["features_rest"],
        key=jax.random.key(1))


def apply_override(method, spec: str):
    """Apply one ``--set section.field=value`` override (the analog of the
    reference's full tyro nested-flag surface, ``method_configs.py:136-143``
    where every config field is a ``--pipeline.model.*`` flag)."""
    try:
        key, raw = spec.split("=", 1)
        section, field = key.split(".", 1)
    except ValueError:
        raise SystemExit(f"--set expects SECTION.FIELD=VALUE, got {spec!r}")
    target = {"model": method.model, "optim": method.optim,
              "trainer": method.trainer}.get(section)
    if target is None:
        raise SystemExit(f"--set section must be model/optim/trainer, "
                         f"got {section!r}")
    names = {f.name for f in dataclasses.fields(target)}
    if field not in names:
        raise SystemExit(f"--set: {section} has no field {field!r}; "
                         f"have {sorted(names)}")
    try:
        value = json.loads(raw)
    except json.JSONDecodeError:
        value = raw
    if isinstance(value, list) and isinstance(
            getattr(target, field), tuple):
        value = tuple(value)
    setattr(method, section, dataclasses.replace(target, **{field: value}))
    return method


def add_common_args(p):
    p.add_argument("method")
    p.add_argument("--data", required=True)
    p.add_argument("--init-ply", default=None)
    p.add_argument("--init-npz", default=None)
    p.add_argument("--init-lod-ply", default=None)
    p.add_argument("--init-pcd", default=None,
                   help="point-cloud .pcd init (reference load_from_file)")
    p.add_argument("--num-random", type=int, default=50000)
    p.add_argument("--output-dir", default=None)
    p.add_argument("--max-num-iterations", type=int, default=None)
    p.add_argument("--pixel-num", type=float, default=None)
    p.add_argument("--load-checkpoint", default=None)
    p.add_argument("--experiment-name", default=None)
    p.add_argument("--steps-per-save", type=int, default=None)
    p.add_argument("--steps-per-eval-image", type=int, default=None)
    p.add_argument("--vis", default=None,
                   help="metric sinks, comma-separated: tensorboard / "
                        "wandb / comet (reference --vis parity)")
    p.add_argument("--viewer", action="store_true",
                   help="serve the interactive viewer while training")
    p.add_argument("--viewer-port", type=int, default=7007)
    p.add_argument("--data-parallel", type=int, default=0,
                   help="camera-batch data parallelism: split "
                        "--num-devices into (data, tile) mesh rows; each "
                        "data row trains its own camera per step "
                        "(reference DDP world_size semantics)")
    p.add_argument("--num-devices", type=int, default=0,
                   help=">1: shard tile rows across a device mesh")
    p.add_argument("--renderer", default=None,
                   choices=["xla", "oracle", "pallas", "pallas1",
                            "pallas2", "pallas3", "pallas4", "pallas5",
                            "pallas_interpret", "pallas5_interpret"],
                   help="renderer tier override (default: method config)")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SECTION.FIELD=VALUE",
                   help="override any config field, e.g. "
                        "--set model.lambda_normal=0.05 "
                        "--set trainer.steps_per_save=1000 "
                        "--set optim.xyz_lr_mult=2 (sections: model, "
                        "optim, trainer; values parsed as JSON, falling "
                        "back to string) — the analog of the reference's "
                        "full tyro --pipeline.model.* flag surface")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    args = parser.parse_args(argv)

    method = dataclasses.replace(__import__(
        "gstex_tpu.configs.methods", fromlist=["get_method"]
    ).get_method(args.method))
    if args.pixel_num is not None:
        method.model = dataclasses.replace(method.model,
                                           pixel_num=args.pixel_num)
    if args.renderer is not None:
        method.model = dataclasses.replace(method.model,
                                           renderer=args.renderer)
    else:
        from ..configs.methods import auto_renderer

        method.model = dataclasses.replace(method.model,
                                           renderer=auto_renderer())
    for ov in args.overrides:
        method = apply_override(method, ov)
    # size the pair buffers to the scene's measured demand at startup
    # (TrainerConfig.demand_size_caps) unless the user pinned the caps
    if not any(o.split("=")[0] in ("model.pair_cap", "model.s_max")
               for o in args.overrides):
        method.trainer = dataclasses.replace(method.trainer,
                                             demand_size_caps=True)
    if args.max_num_iterations is not None:
        method.trainer = dataclasses.replace(
            method.trainer, max_num_iterations=args.max_num_iterations)
        method.optim = dataclasses.replace(method.optim,
                                           max_steps=args.max_num_iterations)
    if args.steps_per_save is not None:
        method.trainer = dataclasses.replace(
            method.trainer, steps_per_save=args.steps_per_save)
    if args.steps_per_eval_image is not None:
        method.trainer = dataclasses.replace(
            method.trainer, steps_per_eval_image=args.steps_per_eval_image)
    if args.vis is not None:
        method.trainer = dataclasses.replace(method.trainer, vis=args.vis)

    exp = args.experiment_name or Path(args.data).name
    ts = time.strftime("%Y-%m-%d_%H%M%S")
    out = args.output_dir or f"outputs/{exp}/{method.name}/{ts}"
    method.trainer = dataclasses.replace(
        method.trainer, output_dir=out,
        load_checkpoint=args.load_checkpoint,
        num_devices=args.num_devices,
        data_parallel=args.data_parallel)

    from ..data.manager import FullImageCache
    from ..train.trainer import Trainer

    train_parsed = build_dataset(method, args.data, "train")
    try:
        eval_parsed = build_dataset(method, args.data, "test")
        eval_cache = FullImageCache.build(eval_parsed, seed=1)
    except FileNotFoundError:
        eval_cache = None
    train_cache = FullImageCache.build(train_parsed,
                                       seed=method.trainer.seed)
    params, buffers = build_model(args, method, train_parsed)

    Path(out).mkdir(parents=True, exist_ok=True)
    (Path(out) / "config.json").write_text(json.dumps({
        "method": method.name,
        "data": str(args.data),
        "model": dataclasses.asdict(method.model),
        "optim": dataclasses.asdict(method.optim),
        "trainer": dataclasses.asdict(method.trainer),
        "dataparser": method.dataparser,
        "downscale_factor": method.downscale_factor,
        "eval_mode": method.eval_mode,
        "eval_interval": method.eval_interval,
        "init_ply": args.init_ply,
        "num_gaussians": int(np.asarray(params.means).shape[0]),
    }, indent=2, default=str))

    trainer = Trainer(method.trainer, method.model, method.optim,
                      params, buffers, train_cache, eval_cache)
    if args.viewer:
        trainer.attach_viewer(port=args.viewer_port)
    trainer.train()
    results = None
    if eval_cache is not None:
        results = trainer.eval_all()
        (Path(out) / "eval.json").write_text(json.dumps(results, indent=2))
        print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
