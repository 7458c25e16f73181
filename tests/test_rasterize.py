"""Tile renderer vs per-pixel oracle: outputs and gradients.

The dual-implementation parity strategy of the reference (SURVEY.md §4.1):
the XLA tile renderer (production) must match the pure-jnp per-pixel oracle
bitwise-comparably for every output map, and its hand-derived custom VJP must
match the oracle's autodiff gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.ops.binning import TileGrid, build_tile_bins
from gstex_tpu.ops.prepare import prepare_splats
from gstex_tpu.ops.rasterize import rasterize
from gstex_tpu.ops.rasterize_ref import render_oracle

H, W = 40, 48
GRID = TileGrid(height=H, width=W, tile_h=8, tile_w=16)


def make_inputs(n=48, seed=0, opaque=False):
    scene = random_scene(jax.random.key(seed), n, chart_pad=(4, 4))
    if opaque:
        scene["opacity_logits"] = scene["opacity_logits"] + 4.0
    cam = orbit_camera(H, W, dist=3.0)
    return scene, cam


def run_both(scene, cam, extra=False):
    prep = prepare_splats(
        scene["means"], scene["log_scales"], scene["quats"],
        scene["opacity_logits"], scene["features_dc"], scene["features_rest"],
        scene["mappings"], cam, active_sh_degree=3)
    bins = build_tile_bins(prep.centers, prep.extents, prep.depths, prep.valid,
                           GRID, pair_cap=8192, s_max=64)
    assert int(bins.overflow) == 0
    tile_out = rasterize(prep.geom, scene["texture"], scene["texture_hw"],
                         bins, cam, GRID, extra_channels=extra)
    # oracle must see the same cull mask: zero out invalid splats' opacity
    geom_o = prep.geom._replace(
        opacity=jnp.where(prep.valid, prep.geom.opacity, 0.0))
    oracle_out = render_oracle(geom_o, scene["texture"], scene["texture_hw"],
                               cam, extra_channels=extra)
    return tile_out, oracle_out


@pytest.mark.parametrize("opaque", [False, True])
def test_forward_matches_oracle(opaque):
    scene, cam = make_inputs(opaque=opaque)
    tile_out, oracle_out = run_both(scene, cam)
    for k in ["img", "texture_rgb", "depth", "alpha", "normal", "reg"]:
        np.testing.assert_allclose(
            np.asarray(tile_out[k]), np.asarray(oracle_out[k]),
            atol=1e-5, rtol=1e-4, err_msg=k)
    # scene actually renders something
    assert float(tile_out["alpha"].max()) > 0.3


def test_extra_channels_match():
    scene, cam = make_inputs()
    tile_out, oracle_out = run_both(scene, cam, extra=True)
    np.testing.assert_allclose(
        np.asarray(tile_out["uv"]), np.asarray(oracle_out["uv"]),
        atol=1e-5, rtol=1e-4)


def _loss_tile(scene, cam, cot):
    prep = prepare_splats(
        scene["means"], scene["log_scales"], scene["quats"],
        scene["opacity_logits"], scene["features_dc"], scene["features_rest"],
        scene["mappings"], cam, active_sh_degree=3)
    bins = build_tile_bins(prep.centers, prep.extents, prep.depths, prep.valid,
                           GRID, pair_cap=8192, s_max=64)
    out = rasterize(prep.geom, scene["texture"], scene["texture_hw"],
                    bins, cam, GRID)
    return sum(jnp.sum(out[k] * cot[k]) for k in cot)


def _loss_oracle(scene, cam, cot):
    prep = prepare_splats(
        scene["means"], scene["log_scales"], scene["quats"],
        scene["opacity_logits"], scene["features_dc"], scene["features_rest"],
        scene["mappings"], cam, active_sh_degree=3)
    geom_o = prep.geom._replace(
        opacity=jnp.where(prep.valid, prep.geom.opacity, 0.0))
    out = render_oracle(geom_o, scene["texture"], scene["texture_hw"], cam)
    key_map = {"texture_rgb": "texture_rgb"}
    return sum(jnp.sum(out[k] * cot[k]) for k in cot)


@pytest.mark.slow
def test_gradients_match_oracle():
    scene, cam = make_inputs(n=32, seed=1)
    key = jax.random.key(42)
    ks = jax.random.split(key, 6)
    cot = {
        "img": jax.random.normal(ks[0], (H, W, 3)),
        "texture_rgb": jax.random.normal(ks[1], (H, W, 3)),
        "depth": 0.1 * jax.random.normal(ks[2], (H, W)),
        "alpha": jax.random.normal(ks[3], (H, W)),
        "normal": 0.1 * jax.random.normal(ks[4], (H, W, 3)),
        "reg": 0.1 * jax.random.normal(ks[5], (H, W)),
    }
    diff_keys = ["means", "log_scales", "quats", "opacity_logits",
                 "features_dc", "features_rest", "texture"]

    def split(scene):
        diff = {k: scene[k] for k in diff_keys}
        rest = {k: scene[k] for k in scene if k not in diff_keys}
        return diff, rest

    diff, rest = split(scene)
    g_tile = jax.grad(lambda d: _loss_tile({**d, **rest}, cam, cot))(diff)
    g_oracle = jax.grad(lambda d: _loss_oracle({**d, **rest}, cam, cot))(diff)

    for k in diff_keys:
        a, b = np.asarray(g_tile[k]), np.asarray(g_oracle[k])
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4,
                                   err_msg=f"grad {k}")
        if k != "features_dc":
            assert np.abs(b).max() > 0, f"oracle grad {k} is all zero"


@pytest.mark.slow
def test_gradients_fp64_exact():
    """In fp64 the hand-derived VJP must equal oracle autodiff to ~1e-12.

    (Finite differences are the wrong oracle here: the blend has genuine small
    discontinuities — the α<1/255 cutoff, the 3σ support cut, the T-break —
    shared with the CUDA reference semantics. Autodiff of the per-pixel
    forward IS the exact derivative of the implemented function.)
    """
    import contextlib

    @contextlib.contextmanager
    def enable_x64():
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    with enable_x64():
        scene, cam = make_inputs(n=12, seed=2)
        scene = {k: (v.astype(jnp.float64)
                     if v.dtype == jnp.float32 else v)
                 for k, v in scene.items()}
        cot = {"img": jnp.ones((H, W, 3)), "texture_rgb": jnp.ones((H, W, 3)),
               "alpha": jnp.ones((H, W))}

        g_tile = jax.grad(lambda m: _loss_tile({**scene, "means": m}, cam,
                                               cot))(scene["means"])
        g_oracle = jax.grad(lambda m: _loss_oracle({**scene, "means": m}, cam,
                                                   cot))(scene["means"])
        scale = float(jnp.abs(g_oracle).max()) + 1e-12
        np.testing.assert_allclose(np.asarray(g_tile) / scale,
                                   np.asarray(g_oracle) / scale, atol=1e-12)
