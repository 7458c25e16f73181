"""Dev: probe Mosaic capabilities for gather-free chart streaming.

A. HBM->SMEM DMA of an int32 id row; scalar read from SMEM scratch used as
   a dynamic DMA index into an ANY-space table (per-splat chart fetch).
B. DMA with minor dim 32 (sub-128 lane slices).
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()

N = 64
CW = 8
S = 128


def kernel_a(ids_ref, table_ref, out_ref, ids_smem, buf, sem_ids, sem):
    t = pl.program_id(0)
    cp = pltpu.make_async_copy(ids_ref.at[t], ids_smem, sem_ids)
    cp.start()
    cp.wait()
    for k in range(S):
        gid = ids_smem[k]
        cpk = pltpu.make_async_copy(
            table_ref.at[pl.ds(gid * CW, CW)], buf.at[pl.ds(k * CW, CW)],
            sem)
        cpk.start()
        cpk.wait()
    out_ref[0] = buf[:]


def probe_a():
    ids = jnp.arange(2 * S, dtype=jnp.int32).reshape(2, S) % N
    table = jnp.arange(N * CW * 128, dtype=jnp.float32).reshape(N * CW, 128)
    out = pl.pallas_call(
        kernel_a,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(2,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, S * CW, 128),
                                   lambda t: (t, 0, 0)),
            scratch_shapes=[
                pltpu.SMEM((S,), jnp.int32),
                pltpu.VMEM((S * CW, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((2, S * CW, 128), jnp.float32),
    )(ids, table)
    expect = np.asarray(table).reshape(N, CW, 128)[np.asarray(ids).reshape(-1)]
    got = np.asarray(out).reshape(2 * S, CW, 128)
    print("A ok:", bool(np.array_equal(got, expect.reshape(2 * S, CW, 128))))


def kernel_b(table_ref, out_ref, buf, sem):
    t = pl.program_id(0)
    cp = pltpu.make_async_copy(
        table_ref.at[pl.ds(t * CW, CW)], buf, sem)
    cp.start()
    cp.wait()
    out_ref[0] = buf[:]


def probe_b():
    table = jnp.arange(4 * CW * 32, dtype=jnp.float32).reshape(4 * CW, 32)
    out = pl.pallas_call(
        kernel_b,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(4,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, CW, 32), lambda t: (t, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((CW, 32), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((4, CW, 32), jnp.float32),
    )(table)
    print("B ok:", bool(np.array_equal(np.asarray(out).reshape(4 * CW, 32),
                                       np.asarray(table))))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "ab"
    if "a" in which:
        probe_a()
    if "b" in which:
        probe_b()
