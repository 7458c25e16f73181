"""CPU-mesh weak-scaling curve for the sharded train step.

Holds the per-device band constant (H = ndev * band_rows) and times the
shard_map'd step at ndev = 1..8 virtual CPU devices. On CPU this
measures the collective pattern's overhead scaling (the psum payload is
constant, compute per device is constant under weak scaling), NOT ICI
timing — the ICI argument is the analytic model in
``gstex_tpu/parallel/scaling.py``. A flat curve here means the
orchestration (shard_map, halo ppermute, grad psum) adds no
superlinear cost.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    PYTHONPATH=. python scripts_dev/mesh_weakscale.py
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.parallel import shard
from gstex_tpu.parallel.scaling import comm_volume, predicted_efficiency
from gstex_tpu.train import optim, step as train_step

BAND_ROWS = 64   # image rows per device (weak scaling)
W = 128
N = 2000


def main():
    results = []
    cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=8, tile_w=16,
                            pair_cap=1 << 16, s_max=256, pixel_num=1e4,
                            background_color="black", renderer="xla")
    scene = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad)
    params, buffers = model.init_params(
        cfg, scene["means"], scene["log_scales"], scene["quats"],
        scene["opacity_logits"], scene["features_dc"],
        scene["features_rest"])

    # NOTE: the 8 virtual devices share 2 physical cores, so a raw weak-
    # scaling curve only measures core oversubscription. The meaningful
    # CPU-mesh number is ORCHESTRATION OVERHEAD at fixed total work:
    # sharded step over ndev bands vs the single-device step on the same
    # full frame — the same flops either way, so the ratio isolates what
    # shard_map + halo ppermute + grad psum add.
    def timeit(fn, state, cam, gt, reps=6):
        # the jitted steps donate the state — thread it through
        state, m = fn(state, cam, gt)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(reps):
            state, m = fn(state, cam, gt)
            jax.block_until_ready(m["loss"])
        return (time.perf_counter() - t0) / reps * 1e3

    for ndev in (1, 2, 4, 8):
        H = BAND_ROWS * ndev
        state, tx = train_step.init_state(
            cfg, optim.OptimConfig(max_steps=100), params, buffers,
            jax.random.key(1))
        cam = orbit_camera(H, W, dist=3.0)
        gt = jnp.zeros((H, W, 3), jnp.float32)
        mesh = Mesh(np.array(jax.devices()[:ndev]), ("tile",))
        fn = shard.make_sharded_train_step(cfg, tx, mesh, H, W)
        ms = timeit(fn, state, cam, gt)
        state1, _ = train_step.init_state(
            cfg, optim.OptimConfig(max_steps=100), params, buffers,
            jax.random.key(1))
        single = train_step.make_train_step(cfg, tx)
        ms1 = timeit(single, state1, cam, gt)
        cv = comm_volume(state.params, W, ndev)
        results.append({
            "ndev": ndev, "H": H, "sharded_step_ms": round(ms, 2),
            "single_device_same_work_ms": round(ms1, 2),
            "orchestration_overhead": round(ms / ms1 - 1.0, 3),
            "grad_psum_mb": round(cv.grad_psum_bytes / 1e6, 2)})
        print(results[-1])
    # analytic leg at the REAL Blender-scale pytree (20k gaussians, 1M
    # texels) and the bench's measured single-chip step time
    scene_b = random_scene(jax.random.key(2), 20000, chart_pad=(8, 8))
    cfg_b = model.GStexConfig(chart_pad=(8, 8), pixel_num=1e6)
    params_b, _ = model.init_params(
        cfg_b, scene_b["means"], scene_b["log_scales"], scene_b["quats"],
        scene_b["opacity_logits"], scene_b["features_dc"],
        scene_b["features_rest"])
    print(json.dumps({
        "weak_scaling_cpu_mesh": results,
        "analytic_v5e_blender_scale": [
            predicted_efficiency(70.0, params_b, 800, n)
            for n in (2, 4, 8, 16)],
    }, indent=1))


if __name__ == "__main__":
    main()
