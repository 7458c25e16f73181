"""Triage the r4 renderer-consistency failure (VERDICT r4 missing #1).

Loads the committed 15k-step synthetic-run checkpoint and renders the
first held-out camera (view 4 of the 125-view orbit) through:
  - pallas eval_only (the path parity.py used — max diff 0.43 vs xla)
  - pallas train kernel (forward of the fwd+bwd path)
  - xla tier
  - per-pixel fp32 oracle at a cropped window (referee)
Reports mean/p99/max |rgb| diffs + overflow/caps at several capacities to
bisect: eval kernel vs fwd kernel vs cap truncation vs T_EPS.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts_dev/triage_consistency.py [--res 800] [--view 4]
"""

import argparse
import dataclasses
import sys

import numpy as np

import jax
import jax.numpy as jnp

CKPT = "parity_out_full/synthetic_run/checkpoints/step-000015000.ckpt.npz"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=800)
    p.add_argument("--view", type=int, default=4)
    p.add_argument("--pair-cap", type=int, default=1 << 19)
    p.add_argument("--s-max", type=int, default=2048)
    p.add_argument("--ckpt", default=CKPT)
    args = p.parse_args()

    from gstex_tpu.data.synthetic import orbit_camera, surface_scene
    from gstex_tpu.models import gstex as model
    from gstex_tpu.train import optim, step as train_step
    from gstex_tpu.utils import checkpoint as ckpt_io
    from gstex_tpu.utils.tpu import enable_compilation_cache

    enable_compilation_cache()

    cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                            pair_cap=args.pair_cap, s_max=args.s_max,
                            pixel_num=1e6, background_color="black",
                            renderer="pallas")

    @jax.jit
    def gt_params():
        scene = surface_scene(jax.random.key(0), 20000,
                              chart_pad=cfg.chart_pad)
        return model.init_params(
            cfg, scene["means"], scene["log_scales"], scene["quats"],
            scene["opacity_logits"], scene["features_dc"],
            scene["features_rest"])

    params0, buffers = gt_params()
    state, _ = train_step.init_state(cfg, optim.OptimConfig(max_steps=15000),
                                     params0, buffers, jax.random.key(1))
    state = ckpt_io.load_checkpoint(args.ckpt, state)
    params = state.params
    buffers = state.buffers
    print(f"loaded ckpt step={int(state.step)}")

    res = args.res
    azi = 2 * np.pi * args.view / 125
    cam = orbit_camera(res, res, dist=4.0, azimuth=azi, elevation=0.35)

    outs = {}

    def run(name, renderer, eval_only=False, pair_cap=None, s_max=None):
        cfg_r = dataclasses.replace(
            cfg, renderer=renderer,
            pair_cap=pair_cap or cfg.pair_cap, s_max=s_max or cfg.s_max)

        @jax.jit
        def f(p, b):
            return model.render(cfg_r, p, b, cam, jnp.int32(15000),
                                jnp.zeros(3), eval_only=eval_only)

        out = f(params, buffers)
        rgb = np.asarray(out["rgb"])
        print(f"{name:28s} overflow={int(out['overflow'])} "
              f"total_pairs={int(out['total_pairs'])} "
              f"max_tile_count={int(out['max_tile_count'])}")
        outs[name] = rgb
        return rgb

    run("xla", "xla")
    run("pallas_eval", "pallas", eval_only=True)
    run("pallas_train", "pallas", eval_only=False)
    run("xla_bigcap", "xla", pair_cap=1 << 21, s_max=4096)
    run("pallas_eval_bigcap", "pallas", eval_only=True,
        pair_cap=1 << 21, s_max=4096)
    run("pallas_train_bigcap", "pallas", eval_only=False,
        pair_cap=1 << 21, s_max=4096)

    ref = outs["xla"]

    def report(name):
        d = np.abs(outs[name] - ref)
        flat = d.max(-1).ravel()
        ij = np.unravel_index(np.argmax(d.max(-1)), d.shape[:2])
        print(f"{name:28s} vs xla: mean={d.mean():.3e} "
              f"p99={np.percentile(flat, 99):.3e} max={d.max():.3e} "
              f"argmax_pixel={ij} n>5e-3={(flat > 5e-3).sum()}")

    for name in outs:
        if name != "xla":
            report(name)

    d = np.abs(outs["pallas_eval_bigcap"] - outs["xla_bigcap"])
    print(f"bigcap eval vs bigcap xla: max={d.max():.3e} "
          f"mean={d.mean():.3e}")
    d = np.abs(outs["pallas_train_bigcap"] - outs["xla_bigcap"])
    print(f"bigcap train vs bigcap xla: max={d.max():.3e} "
          f"mean={d.mean():.3e}")


if __name__ == "__main__":
    main()
