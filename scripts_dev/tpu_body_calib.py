"""Time isolated chunk-body pieces: response / blend / MXU scans per chunk."""
import functools
import time
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from gstex_tpu.utils.tpu import enable_compilation_cache
enable_compilation_cache()
from gstex_tpu.ops import rasterize_pallas2 as rp2
from gstex_tpu.ops import rasterize_pallas3 as rp3
from gstex_tpu.ops import rasterize_pallas4 as rp4

K, P = 16, 1024
ITERS = 1000


def harness(piece, rec_ref, dirs_ref, o_ref):
    chunk0 = rec_ref[...]                       # (K, F)
    d = dirs_ref[...]                           # (8, P): gx, gy, d0, d1, d2
    gx, gy = d[0:1], d[1:2]
    dirs = (d[2:3], d[3:4], d[4:5])
    valid = jnp.ones((K, P), jnp.float32)

    def body(carry):
        i, acc = carry
        # perturb records per iteration so nothing is loop-hoisted
        chunk = chunk0 + acc[:, :32] * 1e-30
        out = piece(chunk, valid, dirs, gx, gy)
        return (i + 1, acc + out)

    def cond(c):
        return c[0] < ITERS

    _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((K, P), jnp.float32)))
    o_ref[...] = acc


def piece_response(chunk, valid, dirs, gx, gy):
    r = rp2._response2(chunk, valid, dirs, gx, gy, mxu=True)
    return r["alpha"] + r["uv_u"] + r["uv_v"] + r["m"] + r["t"] + r["flip"]


def piece_response_novpu(chunk, valid, dirs, gx, gy):
    r = rp2._response2(chunk, valid, dirs, gx, gy, mxu=False)
    return r["alpha"] + r["uv_u"] + r["uv_v"] + r["m"] + r["t"] + r["flip"]


def piece_blend(chunk, valid, dirs, gx, gy):
    a = jnp.clip(chunk[:, 0:1] * 1e-3 + gx * 1e-9, 0.0, 0.1) * valid
    incl = rp3._cumprod_incl(1.0 - a)
    w = a * incl
    pw = rp4._mx(rp4._tri_excl_lower(K, 2), jnp.concatenate([w, w * 2], 0))
    sums = rp4._mx(rp4._block_ones(K, 4),
                   jnp.concatenate([w, w * 2, w * 3, w * 4], 0))
    return incl + pw[:K] + sums[0:1] * 1e-9


def run(name, piece):
    f = pl.pallas_call(
        functools.partial(harness, piece),
        out_shape=jax.ShapeDtypeStruct((K, P), jnp.float32),
    )
    rec = jax.random.normal(jax.random.key(0), (K, 32), jnp.float32)
    d = jax.random.normal(jax.random.key(1), (8, P), jnp.float32)
    g = jax.jit(f)
    r = g(rec, d); float(r[0, 0])
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        r = g(rec, d); float(r[0, 0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:22s} {dt * 1e9 / ITERS:8.0f} ns/chunk", flush=True)


run("response (mxu)", piece_response)
run("response (vpu)", piece_response_novpu)
run("blend+scans", piece_blend)
