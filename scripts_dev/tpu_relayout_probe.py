"""Probe: packed d_charts (U*8, 128) -> (slot, 256) relayout strategies.

(a) XLA chain (current: reshape/transpose/reshape, 3 passes, 11.2 ms in-step)
(b) one Pallas relayout kernel (VMEM permutation, 1 read + 1 write pass)
(c) Pallas per-splat row flatten (the pattern the bwd kernel would use if it
    emitted (CHUNK, 256) blocks directly): 16 (8,32)->(1,256) flattens
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()

U = 100804          # units//pack_n
P = U * 4           # slots
d = jax.random.normal(jax.random.key(0), (U * 8, 128), jnp.float32)


def timeit(fn, *args, n=10):
    sync = jax.jit(lambda o: o.ravel()[0])
    out = fn(*args)
    float(sync(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        float(sync(out))
    return (time.perf_counter() - t0) / n * 1000, out


@jax.jit
def xla_chain(d):
    d4 = d.reshape(U, 8, 4, 32)
    d4 = d4.transpose(0, 2, 1, 3)
    return d4.reshape(P, 256)


BLK = 512   # input rows per grid cell (64 units -> 256 output rows)


def _relayout_kernel(in_ref, out_ref):
    x = in_ref[:]                                   # (BLK, 128)
    y = x.reshape(BLK // 8, 8, 4, 32).transpose(0, 2, 1, 3)
    out_ref[:] = y.reshape(BLK // 2, 256)


@jax.jit
def pallas_relayout(d):
    nblk = (U * 8) // BLK
    return pl.pallas_call(
        _relayout_kernel,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK // 2, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, 256), jnp.float32),
    )(d)


def _flatten_kernel(in_ref, out_ref):
    # per-splat: (8, 32) -> (1, 256) built via lane concatenation, 16x
    x = in_ref[:]                                   # (128, 128): 64 splats
    rows = []
    for s in range(64):
        blk = x[pl.ds(s * 2, 2), :]                 # (2,128) = (8,32) packed?
    # simpler: take (8,32) slices from a (128,128) holding 16 splat blocks
    # of (8,32) stacked 4-wide: emulate cost with reshape on small tiles
    y = x.reshape(16, 8, 4, 32).transpose(0, 2, 1, 3).reshape(64, 256)
    out_ref[:] = y


@jax.jit
def pallas_flatten_small(d):
    nblk = (U * 8) // 128
    return pl.pallas_call(
        _flatten_kernel,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((128, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, 256), jnp.float32),
    )(d)


t_a, ref = timeit(xla_chain, d)
print(f"xla chain          : {t_a:.1f} ms")
t_b, out_b = timeit(pallas_relayout, d)
print(f"pallas relayout 512: {t_b:.1f} ms  match={bool(jnp.array_equal(ref, out_b))}")
t_c, out_c = timeit(pallas_flatten_small, d)
print(f"pallas relayout 128: {t_c:.1f} ms  match={bool(jnp.array_equal(ref, out_c))}")
