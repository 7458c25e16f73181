"""Crop-window oracle referee for the renderer-consistency triage.

Renders a small window at FULL 800-res intrinsics around the worst pixel
through xla / pallas / per-pixel-oracle by shifting (cx, cy); the oracle's
O(HW*N) cost is fine at 64x64. Tells us which tier is wrong.
"""

import argparse
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

CKPT = "parity_out_full/synthetic_run/checkpoints/step-000015000.ckpt.npz"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=800)
    p.add_argument("--view", type=int, default=4)
    p.add_argument("--cy", type=int, default=520)
    p.add_argument("--cx", type=int, default=678)
    p.add_argument("--win", type=int, default=64)
    args = p.parse_args()

    from gstex_tpu.data.synthetic import orbit_camera, surface_scene
    from gstex_tpu.models import gstex as model
    from gstex_tpu.ops.camera import Camera
    from gstex_tpu.train import optim, step as train_step
    from gstex_tpu.utils import checkpoint as ckpt_io
    from gstex_tpu.utils.tpu import enable_compilation_cache

    enable_compilation_cache()
    cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                            pair_cap=1 << 19, s_max=2048, pixel_num=1e6,
                            background_color="black", renderer="pallas")

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
    state = ckpt_io.load_checkpoint(CKPT, state)
    params, buffers = state.params, state.buffers

    res = args.res
    azi = 2 * np.pi * args.view / 125
    full = orbit_camera(res, res, dist=4.0, azimuth=azi, elevation=0.35)
    w = args.win
    y0, x0 = args.cy - w // 2, args.cx - w // 2
    cam = Camera(fx=full.fx, fy=full.fy, cx=full.cx - x0, cy=full.cy - y0,
                 height=w, width=w, c2w=full.c2w)

    outs = {}
    for name, renderer, ev in (("oracle", "oracle", False),
                               ("xla", "xla", False),
                               ("pallas", "pallas", True)):
        cfg_r = dataclasses.replace(cfg, renderer=renderer)

        @jax.jit
        def f(p, b):
            return model.render(cfg_r, p, b, cam, jnp.int32(15000),
                                jnp.zeros(3), eval_only=ev)

        outs[name] = np.asarray(f(params, buffers)["rgb"])

    ref = outs["oracle"]
    for name in ("xla", "pallas"):
        d = np.abs(outs[name] - ref)
        print(f"{name:8s} vs oracle: mean={d.mean():.3e} "
              f"max={d.max():.3e} n>5e-3={(d.max(-1) > 5e-3).sum()}")
    d = np.abs(outs["pallas"] - outs["xla"])
    ij = np.unravel_index(np.argmax(d.max(-1)), d.shape[:2])
    print(f"pallas vs xla in-window: max={d.max():.3e} argmax={ij}")
    pix = (args.cy - y0, args.cx - x0)
    print("rgb at worst full-frame pixel", pix, ":")
    for name in outs:
        print(f"  {name:8s} {outs[name][pix]}")


if __name__ == "__main__":
    main()
