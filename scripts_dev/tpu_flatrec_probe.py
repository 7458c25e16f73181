"""v5 feasibility probes: flat pair-major record streaming.

1. DMA (CHUNK,F) slices from a flat (R, F) f32 HBM array at dynamic
   16-row-aligned offsets (records stream).
2. DMA a fixed int32 window from a 1-D ids array at a 1024-aligned offset
   derived from a dynamic per-tile start (ids window).
3. HBM-space kernel OUTPUT written via make_async_copy from VMEM scratch
   at dynamic offsets (flat d_records / d_charts writes).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 16
F = 128  # HBM 2-D f32 arrays are tiled (1,128): minor dim must be 128
R = 4096
T = 8


def kernel(starts_ref, rec_ref, ids_ref, out_ref, osum_ref, buf, obuf,
           ids_smem, sem, osem, isem):
    t = pl.program_id(0)
    start = starts_ref[t]

    # --- probe 2: ids window at aligned base + SMEM offset indexing
    base = (start // 1024) * 1024
    off = start - base
    cp = pltpu.make_async_copy(
        ids_ref.at[pl.ds(pl.multiple_of(base, 1024), 2048)], ids_smem, isem)
    cp.start()
    cp.wait()

    # --- probe 1: records chunk DMA at 16-aligned dynamic offset
    cp2 = pltpu.make_async_copy(
        rec_ref.at[pl.ds(pl.multiple_of(start, CHUNK), CHUNK)], buf, sem)
    cp2.start()
    cp2.wait()
    chunk = buf[...]                      # (CHUNK, F)
    gid0 = ids_smem[off]
    val = jnp.sum(chunk) + gid0.astype(jnp.float32)
    osum_ref[0] = jnp.full((8, 128), val, jnp.float32)

    # --- probe 3: HBM output DMA write at dynamic offset
    obuf[...] = chunk * 2.0
    wp = pltpu.make_async_copy(
        out_ref.at[pl.ds(pl.multiple_of(start, CHUNK), CHUNK)], obuf, osem)
    # reverse: VMEM -> HBM
    wp2 = pltpu.make_async_copy(obuf, out_ref.at[
        pl.ds(pl.multiple_of(start, CHUNK), CHUNK)], osem)
    wp2.start()
    wp2.wait()


def main():
    rec = jnp.arange(R * F, dtype=jnp.float32).reshape(R, F) / 1000.0
    ids = jnp.arange(R, dtype=jnp.int32)
    starts = jnp.arange(T, dtype=jnp.int32) * 16 * 7   # 16-aligned, spread

    out_shape = [
        jax.ShapeDtypeStruct((R, F), jnp.float32),
        jax.ShapeDtypeStruct((T, 8, 128), jnp.float32),
    ]
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec((1, 8, 128), lambda t, s: (t, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((CHUNK, F), jnp.float32),
                pltpu.VMEM((CHUNK, F), jnp.float32),
                pltpu.SMEM((2048,), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=out_shape,
    )
    out, osum = call(starts, rec, ids)
    out, osum = np.asarray(out), np.asarray(osum)
    rec_np = np.asarray(rec)
    ok = True
    for t in range(T):
        s = t * 16 * 7
        want = rec_np[s:s + CHUNK].sum() + s
        got = osum[t, 0, 0]
        if abs(want - got) > 1e-2 * max(1, abs(want)):
            print(f"t={t} osum mismatch: want {want} got {got}")
            ok = False
        w2 = rec_np[s:s + CHUNK] * 2.0
        g2 = out[s:s + CHUNK]
        if not np.allclose(w2, g2):
            print(f"t={t} out write mismatch: {np.abs(w2 - g2).max()}")
            ok = False
    print("flatrec probe:", "OK" if ok else "FAILED")


if __name__ == "__main__":
    main()
