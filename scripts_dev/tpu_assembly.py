"""Dev: decompose the non-kernel vjp 'assembly' cost on the real chip."""

import time

import jax
import jax.numpy as jnp

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()

from gstex_tpu.data.synthetic import orbit_camera, random_scene  # noqa: E402
from gstex_tpu.models import gstex as model  # noqa: E402
from gstex_tpu.models.gstex import prepare_splats, active_sh_degree  # noqa: E402
from gstex_tpu.ops import sh as sh_ops  # noqa: E402
from gstex_tpu.ops.binning import build_tile_bins  # noqa: E402
from gstex_tpu.ops import rasterize_pallas as rp  # noqa: E402
from gstex_tpu.ops import rasterize_pallas3 as rp3  # noqa: E402

N = 50_000
H = W = 800

cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=1 << 20, s_max=512, pixel_num=1e6,
                        background_color="black", renderer="pallas")


@jax.jit
def init():
    scene = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad,
                         spread=1.2, scale_lo=-4.5, scale_hi=-2.5)
    return model.init_params(cfg, scene["means"], scene["log_scales"],
                             scene["quats"], scene["opacity_logits"],
                             scene["features_dc"], scene["features_rest"])


params, buffers = init()
cam = orbit_camera(H, W, dist=4.0)
grid = cfg.grid(cam.height, cam.width)


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timeit(name, fn, *args, iters=6):
    out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        sync(jax.tree.leaves(out)[0])
    ms = 1000 * (time.perf_counter() - t0) / iters
    print(f"{name:34s} {ms:8.2f} ms", flush=True)
    return out, ms


def loss_of(p):
    out = model.render(cfg, p, buffers, cam, jnp.int32(3000), jnp.zeros(3))
    return out["rgb"].mean() + out["depth"].mean() + out["reg"].mean()


timeit("fwd only", jax.jit(loss_of), params)
timeit("full vjp", jax.jit(jax.grad(loss_of)), params)


def loss_tex_only(p):
    sg = jax.lax.stop_gradient
    p2 = p._replace(means=sg(p.means), log_scales=sg(p.log_scales),
                    quats=sg(p.quats), opacity_logits=sg(p.opacity_logits),
                    features_dc=sg(p.features_dc),
                    features_rest=sg(p.features_rest))
    return loss_of(p2)


def loss_geom_only(p):
    p2 = p._replace(texture=jax.lax.stop_gradient(p.texture))
    return loss_of(p2)


timeit("vjp texture-only", jax.jit(jax.grad(loss_tex_only)), params)
timeit("vjp geom-only", jax.jit(jax.grad(loss_geom_only)), params)

# isolate the charts gather + its transpose
prep = jax.jit(lambda p: prepare_splats(
    p.means, p.log_scales, p.quats, p.opacity_logits, p.features_dc,
    p.features_rest, buffers.mappings, cam,
    active_sh_degree=active_sh_degree(cfg, 3000), sh_degree=cfg.sh_degree,
    fix_init=cfg.fix_init, extent_sigma=cfg.sigma_factor))(params)
bins = jax.jit(lambda pr: build_tile_bins(
    pr.centers, pr.extents, pr.depths, pr.valid, grid,
    pair_cap=cfg.pair_cap, s_max=cfg.s_max))(prep)
texture = jax.jit(lambda p: sh_ops.sh_to_rgb(p.texture))(params)
packed = jax.jit(rp3.pack_charts_cmajor)(texture)
ids = bins.ids

timeit("charts gather fwd", jax.jit(lambda pk, i: pk[i]), packed, ids)

d_charts = jnp.ones((ids.shape[0], ids.shape[1], packed.shape[1],
                     packed.shape[2]), jnp.float32)


def scatter_add(d, i):
    return jnp.zeros_like(packed).at[i].add(d)


timeit("charts scatter-add bwd", jax.jit(scatter_add), d_charts, ids)


def seg_sum(d, i):
    flat = d.reshape(-1, packed.shape[1] * packed.shape[2])
    return jax.ops.segment_sum(flat, i.reshape(-1), num_segments=N)


timeit("charts segment_sum bwd", jax.jit(seg_sum), d_charts, ids)

# records gather + transpose (F=32)
records = jnp.ones((N, rp.F_REC), jnp.float32)
d_rec = jnp.ones((ids.shape[0], ids.shape[1], rp.F_REC), jnp.float32)
timeit("records gather fwd", jax.jit(lambda r, i: r[i]), records, ids)
timeit("records scatter-add bwd",
       jax.jit(lambda d, i: jnp.zeros_like(records).at[i].add(d)),
       d_rec, ids)
