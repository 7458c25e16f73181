"""Golden-file kernel gradcheck (VERDICT r1 item 5).

``tests/golden/rasterize_golden.npz`` records the oracle-tier outputs and
parameter gradients of a fixed synthetic scene. Both renderer tiers must
keep reproducing it — this pins the render semantics (the parity contract
with ``gstex_cuda.texture.texture_gaussians``) against silent drift, the
way the reference pins semantics with its ``_torch_impl`` dual path
(SURVEY.md §4.1).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.ops.binning import TileGrid, build_tile_bins
from gstex_tpu.ops.prepare import prepare_splats
from gstex_tpu.ops.rasterize import rasterize
from gstex_tpu.ops.rasterize_pallas_api import rasterize_pl

H, W = 64, 96
GRID = TileGrid(height=H, width=W, tile_h=32, tile_w=32)
GOLDEN = Path(__file__).parent / "golden" / "rasterize_golden.npz"
DIFF_KEYS = ["means", "log_scales", "quats", "opacity_logits", "texture"]


def _scene_cam():
    return random_scene(jax.random.key(42), 48, chart_pad=(4, 4)), \
        orbit_camera(H, W, dist=3.0)


def _render(render_fn, scene, cam, diff):
    full = {**scene, **diff}
    prep = prepare_splats(full["means"], full["log_scales"], full["quats"],
                          full["opacity_logits"], full["features_dc"],
                          full["features_rest"], full["mappings"], cam,
                          active_sh_degree=3)
    bins = build_tile_bins(prep.centers, prep.extents, prep.depths,
                           prep.valid, GRID, pair_cap=8192, s_max=64)
    return render_fn(prep.geom, full["texture"], full["texture_hw"], bins,
                     cam, GRID)


@pytest.mark.parametrize(
    "tier", ["xla", pytest.param("pallas", marks=pytest.mark.slow)])
def test_rasterize_matches_golden(tier):
    golden = dict(np.load(GOLDEN))
    scene, cam = _scene_cam()
    fn = rasterize if tier == "xla" else (
        lambda *a, **k: rasterize_pl(*a, interpret=True, **k))
    out = _render(fn, scene, cam, {})
    for k in ["img", "texture_rgb", "depth", "alpha", "normal", "reg"]:
        np.testing.assert_allclose(np.asarray(out[k]), golden[f"out_{k}"],
                                   atol=3e-5, rtol=1e-4, err_msg=k)

    ks = jax.random.split(jax.random.key(7), 3)
    cot = {"img": jax.random.normal(ks[0], (H, W, 3)),
           "texture_rgb": jax.random.normal(ks[1], (H, W, 3)),
           "alpha": jax.random.normal(ks[2], (H, W))}

    def loss(diff):
        o = _render(fn, scene, cam, diff)
        return sum(jnp.sum(o[k] * cot[k]) for k in cot)

    grads = jax.grad(loss)({k: scene[k] for k in DIFF_KEYS})
    for k in DIFF_KEYS:
        ref = golden[f"grad_{k}"]
        scale = np.abs(ref).max() + 1e-8
        np.testing.assert_allclose(np.asarray(grads[k]) / scale, ref / scale,
                                   atol=5e-4, err_msg=f"grad {k}")
        assert np.abs(ref).max() > 0
