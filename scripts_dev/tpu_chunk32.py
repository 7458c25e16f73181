"""CHUNK=32 vs 16 for the v4 kernels (fwd + bwd timing + parity)."""
import time
import jax
import jax.numpy as jnp
import numpy as np
from gstex_tpu.utils.tpu import enable_compilation_cache
enable_compilation_cache()
from gstex_tpu.data.synthetic import orbit_camera, random_scene
from gstex_tpu.models import gstex as model
from gstex_tpu.ops.binning import build_tile_bins
from gstex_tpu.ops.cull import make_pair_cull
from gstex_tpu.ops.prepare import prepare_splats
from gstex_tpu.ops import sh as sh_ops
from gstex_tpu.ops import rasterize_pallas as rp
from gstex_tpu.ops import rasterize_pallas3 as rp3
from gstex_tpu.ops import rasterize_pallas4 as rp4
from gstex_tpu.ops import rasterize_pallas_bwd as rpb

N = 50_000
H = W = 800
cfg = model.GStexConfig(chart_pad=(8, 8), tile_h=32, tile_w=32,
                        pair_cap=1 << 19, s_max=512, pixel_num=1e6,
                        background_color="black")

@jax.jit
def init():
    scene = random_scene(jax.random.key(0), N, chart_pad=cfg.chart_pad,
                         spread=1.2, scale_lo=-4.5, scale_hi=-2.5)
    return model.init_params(cfg, scene["means"], scene["log_scales"],
                             scene["quats"], scene["opacity_logits"],
                             scene["features_dc"], scene["features_rest"])

params, buffers = init()
cam = orbit_camera(H, W, dist=4.0)
grid = cfg.grid(H, W)

@jax.jit
def make_inputs(p):
    prep = prepare_splats(p.means, p.log_scales, p.quats, p.opacity_logits,
                          p.features_dc, p.features_rest, buffers.mappings,
                          cam, active_sh_degree=3)
    cf = make_pair_cull(prep.geom, cam, grid)
    bins = build_tile_bins(prep.centers, prep.extents, prep.depths,
                           prep.valid, grid, pair_cap=cfg.pair_cap,
                           s_max=cfg.s_max, cull_fn=cf)
    texture = sh_ops.sh_to_rgb(p.texture)
    packed = rp3.pack_charts_cmajor(texture)
    table = packed.reshape(-1, packed.shape[-1])
    records = rp.assemble_records(prep.geom, cam.c2w[:3, 3],
                                  buffers.texture_hw)
    rec_pairs = records[bins.ids]
    counts = jnp.minimum(bins.counts, bins.ids.shape[1])
    cam_info = rp._cam_info(cam, jnp.zeros((2,), jnp.float32))
    return rec_pairs, bins.ids, counts, cam_info, table

rec_pairs, ids, counts, cam_info, table = jax.block_until_ready(
    make_inputs(params))
float(counts[0])

def run(chunk):
    rp4.CHUNK = chunk
    @jax.jit
    def fwd(rec_pairs, ids, counts, cam_info, table):
        maps, ncon = rp4.rasterize_pallas4_fwd(
            grid, cfg.chart_pad,
            rp4.PallasInputs4(rec_pairs, ids, counts, cam_info), table)
        return jnp.concatenate([maps[n] for n in rp.CH_NAMES], axis=1), ncon
    out, ncon = fwd(rec_pairs, ids, counts, cam_info, table)
    float(out[0, 0, 0])
    gmaps = jnp.ones((out.shape[0], rpb.NG * 8, 128), jnp.float32) * 1e-6
    @jax.jit
    def bwd(counts, cam_info, rec_pairs, ids, table, out, ncon, gmaps):
        return rp4.rasterize_pallas4_bwd(
            grid, cfg.chart_pad, counts, cam_info, rec_pairs, ids, table,
            out, ncon, gmaps)
    d_rec, d_ch = bwd(counts, cam_info, rec_pairs, ids, table, out, ncon,
                      gmaps)
    float(d_rec[0, 0, 0])
    def t(fn, *a, iters=8):
        r = fn(*a); jax.tree.leaves(r)[0].block_until_ready()
        float(jax.tree.leaves(r)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*a); float(jax.tree.leaves(r)[0].ravel()[0])
        return 1000 * (time.perf_counter() - t0) / iters
    tf = t(fwd, rec_pairs, ids, counts, cam_info, table)
    tb = t(bwd, counts, cam_info, rec_pairs, ids, table, out, ncon, gmaps)
    print(f"CHUNK={chunk}: fwd {tf:.1f} ms  bwd {tb:.1f} ms", flush=True)
    return np.asarray(out), np.asarray(d_rec), np.asarray(d_ch)

o16, dr16, dc16 = run(16)
o32, dr32, dc32 = run(32)
print("fwd parity:", np.max(np.abs(o16 - o32)), flush=True)
print("d_rec parity:", np.max(np.abs(dr16 - dr32)), flush=True)
print("d_chart sum parity:", np.max(np.abs(
    dc16.reshape(dc16.shape[0], -1).sum(1) - dc32.reshape(dc32.shape[0], -1).sum(1))), flush=True)
