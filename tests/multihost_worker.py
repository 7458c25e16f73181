"""Worker for the 2-process multi-host test (not a pytest module).

Each process owns 4 virtual CPU devices; jax.distributed joins them into
one 8-device world; the sharded train step runs over a global mesh with
cross-process collectives. Process 0 writes the resulting loss/psnr and a
parameter checksum for the driver to compare against the single-process
8-device result. Mirrors what the reference's DDP rendezvous does
(``nerfstudio/scripts/train.py:103-157``) with jax.distributed.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from gstex_tpu.parallel.distributed import init_distributed, tile_mesh

    init_distributed(coordinator=f"localhost:{port}", num_processes=2,
                     process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, len(jax.devices())

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gstex_tpu.data.synthetic import orbit_camera, random_scene
    from gstex_tpu.models import gstex as model
    from gstex_tpu.parallel import shard
    from gstex_tpu.train import optim, step as train_step

    cfg = model.GStexConfig(chart_pad=(4, 4), tile_h=8, tile_w=16,
                            pair_cap=1 << 14, s_max=64, pixel_num=500,
                            background_color="black")
    h, w = 64, 48
    scene = random_scene(jax.random.key(0), 48, chart_pad=cfg.chart_pad)
    params, buffers = model.init_params(
        cfg, scene["means"], scene["log_scales"], scene["quats"],
        scene["opacity_logits"], scene["features_dc"],
        scene["features_rest"])
    ocfg = optim.OptimConfig(max_steps=100)
    state, tx = train_step.init_state(cfg, ocfg, params, buffers,
                                      jax.random.key(3))
    cam = orbit_camera(h, w, dist=3.0)
    gt = jnp.full((h, w, 3), 0.25, jnp.float32)

    mesh = tile_mesh()   # 8 global devices across the 2 processes

    # every input is identical on both processes -> replicated global arrays
    glob = lambda tree: multihost_utils.host_local_array_to_global_array(
        tree, mesh, P())
    state = jax.tree.map(lambda x: x, state)   # materialize
    state = glob(state)
    cam_g = glob(cam)
    gt_g = glob(gt)

    step_fn = shard.make_sharded_train_step(cfg, tx, mesh, h, w)
    new_state, metrics = step_fn(state, cam_g, gt_g)

    loss = float(jax.device_get(metrics["loss"].addressable_data(0)))
    psnr = float(jax.device_get(metrics["psnr"].addressable_data(0)))
    means = jax.device_get(new_state.params.means.addressable_data(0))
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({"loss": loss, "psnr": psnr,
                       "means_sum": float(abs(means).sum())}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
