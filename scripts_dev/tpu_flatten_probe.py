"""Probe: per-splat (8,32)->(1,256) flatten inside a pallas kernel.

Emulates the bwd kernel's d_charts emission: per chunk of 16 splats, build
a (16, 256) block from 16 (8, 32) sub-blocks. Variants:
(a) blk.reshape(1, 256)              - maybe unsupported shape cast
(b) lane-concat of 8 (1,32) slices   - always supported
Measures per-chunk cost over a realistic chunk count.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()

CHUNKS = 6728            # trained-scene walked chunks
K = 16


def _kern_reshape(in_ref, out_ref):
    x = in_ref[:]                                  # (128, 128): 16 (8,32)x4
    rows = []
    for s in range(K):
        r0 = (s // 4) * 8
        blk = x[r0:r0 + 8, (s % 4) * 32:(s % 4) * 32 + 32]
        rows.append(blk.reshape(1, 256))
    out_ref[:] = jnp.concatenate(rows, axis=0)


def _kern_concat(in_ref, out_ref):
    x = in_ref[:]
    rows = []
    for s in range(K):
        r0 = (s // 4) * 8
        blk = x[r0:r0 + 8, (s % 4) * 32:(s % 4) * 32 + 32]
        row = jnp.concatenate([blk[w:w + 1, :] for w in range(8)], axis=1)
        rows.append(row)
    out_ref[:] = jnp.concatenate(rows, axis=0)


def _kern_copy(in_ref, out_ref):
    # baseline: pure copy cost of the same block shapes
    x = in_ref[:]
    out_ref[:] = jnp.concatenate([x, x], axis=1)[:K, :]


def build(kern):
    @jax.jit
    def f(d):
        return pl.pallas_call(
            kern,
            grid=(CHUNKS,),
            in_specs=[pl.BlockSpec((128, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((K, 256), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((CHUNKS * K, 256), jnp.float32),
        )(d)
    return f


d = jax.random.normal(jax.random.key(0), (CHUNKS * 128, 128), jnp.float32)


def timeit(fn, *args, n=10):
    sync = jax.jit(lambda o: o.ravel()[0])
    out = fn(*args)
    float(sync(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        float(sync(out))
    return (time.perf_counter() - t0) / n * 1000, out


for name, kern in [("copy-baseline", _kern_copy),
                   ("reshape", _kern_reshape),
                   ("lane-concat", _kern_concat)]:
    try:
        t, _ = timeit(build(kern), d)
        print(f"{name:14s}: {t:.1f} ms ({CHUNKS} chunks)")
    except Exception as e:
        print(f"{name:14s}: FAILED {str(e)[:120]}")
