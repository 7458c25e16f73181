"""Isolate the d_charts pair-space -> per-gaussian segment_sum cost."""
import time
import jax
import jax.numpy as jnp
from gstex_tpu.utils.tpu import enable_compilation_cache
enable_compilation_cache()

T, S = 625, 512
N = 50_000
CW, CG = 8, 32
PACK = 4

key = jax.random.key(0)
d_charts = jax.random.normal(key, (T, S // PACK * CW, 128), jnp.float32)
ids = jax.random.randint(jax.random.key(1), (T, S), 0, N, jnp.int32)

@jax.jit
def reduce_segsum(d_charts, ids):
    d = d_charts.reshape(T, S // PACK, CW, PACK, CG)
    d = d.transpose(0, 1, 3, 2, 4).reshape(T * S, CW * CG)
    return jax.ops.segment_sum(d, ids.reshape(-1), num_segments=N)

@jax.jit
def reduce_sorted(d_charts, ids):
    d = d_charts.reshape(T, S // PACK, CW, PACK, CG)
    d = d.transpose(0, 1, 3, 2, 4).reshape(T * S, CW * CG)
    flat = ids.reshape(-1)
    order = jnp.argsort(flat)
    return jax.ops.segment_sum(d[order], flat[order], num_segments=N,
                               indices_are_sorted=True)

def timeit(name, fn, *a, iters=6):
    r = fn(*a); float(r.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a); float(r.ravel()[0])
    print(f"{name:18s} {1000*(time.perf_counter()-t0)/iters:8.1f} ms",
          flush=True)

timeit("segment_sum", reduce_segsum, d_charts, ids)
timeit("sorted+segsum", reduce_sorted, d_charts, ids)

# transpose/reshape alone
@jax.jit
def shuffle_only(d_charts):
    d = d_charts.reshape(T, S // PACK, CW, PACK, CG)
    return d.transpose(0, 1, 3, 2, 4).reshape(T * S, CW * CG)

timeit("pack shuffle", shuffle_only, d_charts)

@jax.jit
def reduce_slotwise(d_charts, ids):
    rows = T * (S // PACK) * CW
    dflat = d_charts.reshape(rows, 128)
    gids = ids.reshape(T, S // PACK, PACK)
    y = jnp.arange(CW, dtype=ids.dtype)
    out = jnp.zeros((N * CW, CG), jnp.float32)
    for j in range(PACK):
        seg = (gids[:, :, j:j + 1] * CW + y[None, None, :]).reshape(rows)
        out = out + jax.ops.segment_sum(dflat[:, j * CG:(j + 1) * CG], seg,
                                        num_segments=N * CW)
    return out

timeit("slotwise segsum", reduce_slotwise, d_charts, ids)
