"""Rebuild a trained pipeline from a saved run directory.

The analog of ``eval_setup`` (reference ``nerfstudio/utils/eval_utils.py:
68-113``): load config.json, rebuild datamanager + model, restore the latest
checkpoint.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path


def eval_setup(run_dir):
    import jax

    from ..configs.methods import get_method
    from ..data.manager import FullImageCache
    from ..models import gstex as model
    from ..models import init_io
    from ..train.trainer import Trainer
    from ..utils import checkpoint as ckpt_io
    from .train import build_dataset

    run_dir = Path(run_dir)
    cfg = json.loads((run_dir / "config.json").read_text())
    method = get_method(cfg["method"])
    method.model = model.GStexConfig(**{
        k: (tuple(v) if isinstance(v, list) else v)
        for k, v in cfg["model"].items()})
    method.trainer = dataclasses.replace(method.trainer,
                                         output_dir=str(run_dir))

    train_parsed = build_dataset(method, cfg["data"], "train")
    try:
        eval_parsed = build_dataset(method, cfg["data"], "test")
        eval_cache = FullImageCache.build(eval_parsed, seed=1)
    except FileNotFoundError:
        eval_cache = None
    train_cache = FullImageCache.build(train_parsed)

    # template params with the trained N (from the checkpoint leaves)
    ck = ckpt_io.latest_checkpoint(run_dir / "checkpoints")
    if ck is None:
        raise FileNotFoundError(f"no checkpoint in {run_dir}/checkpoints")
    if cfg.get("init_ply"):
        raw = init_io.raw_from_gaussian_ply(cfg["init_ply"],
                                            sh_degree=method.model.sh_degree,
                                            fix_init=method.model.fix_init)
    elif train_parsed.points_xyz is not None:
        raw = init_io.raw_from_points(train_parsed.points_xyz,
                                      train_parsed.points_rgb,
                                      sh_degree=method.model.sh_degree,
                                      fix_init_pts=method.model.fix_init)
    else:
        raw = init_io.raw_random(cfg.get("num_gaussians", 50000),
                                 sh_degree=method.model.sh_degree)
    params, buffers = model.init_params(
        method.model, raw["means"], raw["log_scales"], raw["quats"],
        raw["opacity_logits"], raw["features_dc"], raw["features_rest"],
        key=jax.random.key(1))
    trainer = Trainer(method.trainer, method.model, method.optim,
                      params, buffers, train_cache, eval_cache)
    trainer.state = ckpt_io.load_checkpoint(ck, trainer.state)
    return trainer, method, cfg
