"""gstex-parity — executable Table-1 parity harness (VERDICT r1 item 5).

One command that, given a Blender/DTU scene + 2DGS init ply, produces the
parity verdict against the reference's published numbers
(``/root/reference/README.md:9-18`` errata table; see BASELINE.md):

1. **Config 1 (gradcheck)**: 2DGS-mode (``pixel_num=0``, the reference's
   "simulate 2DGS" switch, ``gstex.py:204-206``) forward + backward on one
   real train view — the Pallas kernels vs the XLA oracle tier, outputs
   and all parameter gradients (BASELINE.json correctness contract).
2. **Config 2 (training)**: the full textured method config (15k iters
   NVS schedule, ``gstex_configs.py:188``) trained to completion, then
   ``eval_all`` PSNR compared to the Table-1 target (33.25 Blender /
   32.87 DTU mean).

Usage (when a dataset is mounted):
    gstex-parity --data /data/nerf_synthetic/chair \
        --init-ply /data/init_nvs/chair/point_cloud.ply --dataset blender
Emits ``parity.json`` in --output-dir. ``--quick N`` trains N iters
instead of the full schedule (smoke mode).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path

import numpy as np

TABLE1_PSNR = {"blender": 33.25, "dtu": 32.87}   # README.md:9-18 errata


def gradcheck(method, data_dir, init_ply, renderer="pallas"):
    """Config-1: 2DGS-mode fwd+bwd, fast kernels vs the XLA oracle on one
    real train view. Returns max relative output/grad diffs."""
    import jax
    import jax.numpy as jnp

    from ..data.manager import FullImageCache
    from ..models import gstex as model, init_io
    from .train import build_dataset

    mcfg = dataclasses.replace(method.model, pixel_num=0.0, renderer="xla")
    parsed = build_dataset(method, data_dir, "train")
    cache = FullImageCache.build(parsed)
    raw = init_io.raw_from_gaussian_ply(init_ply, sh_degree=mcfg.sh_degree,
                                        fix_init=mcfg.fix_init)
    params, buffers = model.init_params(
        mcfg, raw["means"], raw["log_scales"], raw["quats"],
        raw["opacity_logits"], raw["features_dc"], raw["features_rest"])
    cam, img, _ = cache.get(0)
    gt = model.composite_gt(cache.device_image(0), jnp.zeros(3))

    def loss_with(renderer_name):
        cfg_r = dataclasses.replace(mcfg, renderer=renderer_name)

        def f(p):
            out = model.render(cfg_r, p, buffers, cam, jnp.int32(15000),
                               jnp.zeros(3))
            total, _ = model.loss_fn(cfg_r, out, gt, jnp.int32(15000))
            return total, out["rgb"]

        return jax.value_and_grad(f, has_aux=True)(params)

    (l_ref, rgb_ref), g_ref = loss_with("xla")
    (l_pl, rgb_pl), g_pl = loss_with(renderer)

    def rel(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))

    grad_diffs = {k: rel(a, b) for k, a, b in zip(
        params._fields, g_pl, g_ref)}
    return {
        "loss_xla": float(l_ref), "loss_pallas": float(l_pl),
        "rgb_rel_diff": rel(rgb_pl, rgb_ref),
        "grad_rel_diffs": grad_diffs,
        "gradcheck_pass": rel(rgb_pl, rgb_ref) < 1e-3
        and max(grad_diffs.values()) < 5e-3,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True)
    p.add_argument("--init-ply", required=True)
    p.add_argument("--dataset", choices=["blender", "dtu"],
                   default="blender")
    p.add_argument("--output-dir", default="parity_out")
    p.add_argument("--renderer", default=None)
    p.add_argument("--quick", type=int, default=0,
                   help="train only N iters (smoke mode; verdict reported "
                        "as quick)")
    p.add_argument("--skip-train", action="store_true")
    args = p.parse_args(argv)

    from ..configs.methods import auto_renderer, get_method
    from .train import main as train_main

    method = get_method("gstex-blender-nvs" if args.dataset == "blender"
                        else "gstex-dtu-nvs")
    renderer = args.renderer or auto_renderer()
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    report = {"dataset": args.dataset, "data": args.data,
              "renderer": renderer,
              "target_psnr_table1": TABLE1_PSNR[args.dataset]}

    print("[parity] config 1: 2DGS-mode gradcheck (pixel_num=0)")
    t0 = time.time()
    report["gradcheck"] = gradcheck(method, args.data, args.init_ply,
                                    renderer=renderer)
    report["gradcheck"]["seconds"] = time.time() - t0
    print(json.dumps(report["gradcheck"], indent=1))

    if not args.skip_train:
        iters = args.quick or method.trainer.max_num_iterations
        print(f"[parity] config 2: textured training ({iters} iters)")
        run_dir = out_dir / "run"
        train_argv = [
            "gstex-blender-nvs" if args.dataset == "blender"
            else "gstex-dtu-nvs",
            "--data", args.data, "--init-ply", args.init_ply,
            "--max-num-iterations", str(iters),
            "--steps-per-eval-image", "0",
            "--renderer", renderer,
            "--output-dir", str(run_dir),
        ]
        agg = train_main(train_argv)
        if agg:
            report["eval"] = agg
            report["psnr"] = agg.get("psnr")
            full = iters >= method.trainer.max_num_iterations
            report["verdict"] = (
                "PASS" if full and agg.get("psnr", 0)
                >= TABLE1_PSNR[args.dataset] - 0.3 else
                "QUICK (not comparable — partial schedule)" if not full
                else "FAIL")
    (out_dir / "parity.json").write_text(json.dumps(report, indent=1))
    print(f"[parity] wrote {out_dir / 'parity.json'}")
    return report


if __name__ == "__main__":
    main()
