"""Dev: pallas vs xla renderer on the real chip — timing + output parity.

Everything (scene build included) lives inside jit to survive the axon
tunnel's per-op compile latency. Usage: python scripts_dev/tpu_compare.py
[fwd|train] [N] [s_max]
"""

import sys
import time

import jax
import jax.numpy as jnp

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()

from gstex_tpu.data.synthetic import orbit_camera, random_scene  # noqa: E402
from gstex_tpu.models import gstex as model  # noqa: E402
from gstex_tpu.train import optim, step as train_step  # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "fwd"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
S_MAX = int(sys.argv[3]) if len(sys.argv) > 3 else 512
H = W = 800


def cfg_for(renderer):
    return model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                             pair_cap=1 << 20, s_max=S_MAX, pixel_num=1e6,
                             background_color="black", renderer=renderer)


@jax.jit
def build():
    cfg = cfg_for("xla")
    scene = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad,
                         spread=1.2, scale_lo=-4.5, scale_hi=-2.5)
    return model.init_params(cfg, scene["means"], scene["log_scales"],
                             scene["quats"], scene["opacity_logits"],
                             scene["features_dc"], scene["features_rest"])


def main():
    t0 = time.time()
    params, buffers = build()
    jax.block_until_ready(params)
    print(f"build {time.time()-t0:.1f}s", flush=True)
    cam = orbit_camera(H, W, dist=4.0)

    results = {}
    for renderer in ["xla", "pallas"]:
        cfg = cfg_for(renderer)
        if MODE == "fwd":
            fn = jax.jit(lambda p, _cfg=cfg: model.render(
                _cfg, p, buffers, cam, jnp.int32(3000), jnp.zeros(3)))
            arg = params
        else:
            state, tx = train_step.init_state(cfg, optim.OptimConfig(),
                                              params, buffers,
                                              jax.random.key(1))
            sfn = train_step.make_train_step(cfg, tx)
            gt = jnp.zeros((H, W, 3))
            fn = lambda s, _f=sfn: _f(s, cam, gt)[0]
            arg = state
        t0 = time.time()
        out = fn(arg)
        jax.block_until_ready(out)
        print(f"{renderer} compile+first {time.time()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            out = fn(arg)
        jax.block_until_ready(out)
        ms = 1000 * (time.perf_counter() - t0) / iters
        print(f"{renderer} {MODE} {ms:.2f} ms  "
              f"({H*W/1e6/(ms/1000):.1f} Mpix/s)", flush=True)
        if MODE == "fwd":
            results[renderer] = out

    if MODE == "fwd":
        o1, o2 = results["xla"], results["pallas"]
        print("pairs", int(o1["total_pairs"]), "overflow",
              int(o1["overflow"]), "alpha", float(o1["alpha"].mean()))
        for k in ["img", "texture_rgb", "depth", "alpha", "normal", "reg"]:
            d = float(jnp.abs(o1[k] - o2[k]).max())
            print(f"maxdiff {k}: {d:.3e}", flush=True)


if __name__ == "__main__":
    main()
