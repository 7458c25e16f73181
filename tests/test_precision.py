"""Geometry-matmul precision regression (round-5 consistency triage).

On TPU, f32 matmuls lower to ONE bf16 MXU pass under default precision —
rel error ~4e-3. That rounded projected centers by up to 2.7 px and ray
directions enough to move trained-scene ray-surfel hits by whole texels:
the round-4 ``renderer_consistency_max_rgb_diff: 0.43`` failure was the
XLA/oracle tiers' ``d_cam @ R.T`` plus the pallas ``_cam_info`` rotation,
NOT the kernels. Every (*, 3) @ (3, 3) geometry transform must therefore
carry an EXPLICIT ``precision=HIGHEST`` — the test tier cannot catch the
bf16 path at runtime (conftest forces highest matmul precision on CPU),
so these tests assert the precision is baked into the jaxpr itself.

Reference contract: ``nerfstudio/models/gstex.py:1161`` renders the same
state through ``use_torch_impl`` and the CUDA path interchangeably; both
are fp32 end-to-end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gstex_tpu.ops.camera import (Camera, pixel_ray_dirs, project_points,
                                  ray_dirs_typed, surfel_aabb_2d,
                                  viewmat_from_c2w)


def _dot_precisions(jaxpr):
    """All dot_general precision params in a (closed) jaxpr, recursively."""
    out = []

    def walk(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "dot_general":
                out.append(eqn.params.get("precision"))
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr)
    walk(jaxpr.jaxpr if hasattr(jaxpr, "jaxpr") else jaxpr)
    return out


def _assert_all_highest(fn, *args):
    precisions = _dot_precisions(jax.make_jaxpr(fn)(*args))
    assert precisions, "expected at least one dot_general"
    for p in precisions:
        assert p == (jax.lax.Precision.HIGHEST,) * 2, \
            f"geometry dot_general with precision={p} (bf16 MXU pass on " \
            "TPU — see module docstring)"


def _cam():
    c2w = jnp.asarray(np.eye(4, dtype=np.float32)[:3])
    return Camera(fx=jnp.float32(800.0), fy=jnp.float32(800.0),
                  cx=jnp.float32(400.0), cy=jnp.float32(400.0),
                  height=64, width=64, c2w=c2w)


def test_project_points_precision():
    means = jnp.zeros((16, 3))
    vm = viewmat_from_c2w(_cam().c2w)
    _assert_all_highest(
        lambda m: project_points(m, vm, (jnp.float32(800.0),) * 4), means)


def test_ray_dirs_precision():
    px = jnp.zeros((8, 8))
    for f in (lambda x, y: pixel_ray_dirs(x, y, _cam()),
              lambda x, y: ray_dirs_typed(x, y, _cam(), "fisheye"),
              lambda x, y: ray_dirs_typed(x, y, _cam(), "equirectangular")):
        _assert_all_highest(f, px, px)


def test_aabb_precision():
    n = 8
    _assert_all_highest(
        lambda m: surfel_aabb_2d(m, jnp.ones(n), jnp.ones(n),
                                 jnp.broadcast_to(jnp.eye(3), (n, 3, 3)),
                                 viewmat_from_c2w(_cam().c2w),
                                 (jnp.float32(800.0),) * 4),
        jnp.zeros((n, 3)))


def test_cam_info_precision():
    from gstex_tpu.ops.rasterize_pallas import _cam_info

    _assert_all_highest(lambda c: _cam_info(c, jnp.zeros(2)), _cam())


def test_cull_table_precision():
    from gstex_tpu.ops.cull import make_pair_cull
    from gstex_tpu.ops.prepare import prepare_splats

    def table(means):
        cam = _cam()
        prep = prepare_splats(
            means, jnp.full((8, 2), -3.0),
            jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (8, 1)),
            jnp.zeros((8, 1)), jnp.zeros((8, 3)), jnp.zeros((8, 15, 3)),
            jnp.zeros((8, 2), jnp.int32), cam, active_sh_degree=0)
        from gstex_tpu.models.gstex import GStexConfig

        grid = GStexConfig().grid(64, 64)
        return make_pair_cull(prep.geom, cam, grid).table

    means = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (8, 3)).astype(np.float32))
    means = means.at[:, 2].add(-4.0)
    _assert_all_highest(table, means)


def test_prepare_splats_no_default_dots():
    """The whole prepare stage (feeds every renderer tier AND the kernel
    records) must not contain a single default-precision dot."""
    from gstex_tpu.ops.prepare import prepare_splats

    def prep(means):
        return prepare_splats(
            means, jnp.full((8, 2), -3.0),
            jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (8, 1)),
            jnp.zeros((8, 1)), jnp.zeros((8, 3)), jnp.zeros((8, 15, 3)),
            jnp.zeros((8, 2), jnp.int32), _cam(), active_sh_degree=3)

    precisions = _dot_precisions(jax.make_jaxpr(prep)(jnp.zeros((8, 3))))
    for p in precisions:
        assert p == (jax.lax.Precision.HIGHEST,) * 2, p


@pytest.mark.slow
def test_trained_statistics_two_tier_render():
    """Saturated-opacity surface statistics (the regime that exposed the
    round-4 failure) rendered through the flat pallas path (interpret) and
    the XLA tier must agree everywhere — including break-threshold pixels."""
    import dataclasses

    from gstex_tpu.data.synthetic import orbit_camera, surface_scene
    from gstex_tpu.models import gstex as model

    cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=16, tile_w=16,
                            pair_cap=1 << 14, s_max=256, pixel_num=4096,
                            background_color="black",
                            renderer="pallas_interpret")
    scene = surface_scene(jax.random.key(3), 400, chart_pad=cfg.chart_pad)
    params, buffers = model.init_params(
        cfg, scene["means"], scene["log_scales"], scene["quats"],
        scene["opacity_logits"], scene["features_dc"],
        scene["features_rest"])
    # saturate opacities: the trained-state regime (alpha ~ ALPHA_CLAMP)
    params = params._replace(opacity_logits=jnp.full_like(
        params.opacity_logits, 8.0))
    cam = orbit_camera(64, 64, dist=4.0, azimuth=0.2, elevation=0.35)

    outs = {}
    for r in ("pallas_interpret", "xla"):
        cfg_r = dataclasses.replace(cfg, renderer=r)
        out = model.render(cfg_r, params, buffers, cam, jnp.int32(15000),
                          jnp.zeros(3), eval_only=(r != "xla"))
        assert int(out["overflow"]) == 0
        outs[r] = np.asarray(out["rgb"])
    d = np.abs(outs["pallas_interpret"] - outs["xla"])
    assert d.max() < 5e-3, f"renderer consistency: max diff {d.max():.3e}"
