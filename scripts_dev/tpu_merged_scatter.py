"""Probe: two segment_sums (d_rec 32-of-128 lanes + d_chart 256 lanes)
vs ONE merged 384-lane segment_sum over the same ids.

The bwd kernel already writes 128+256 lanes per slot; merging the two
HBM buffers into one (P, 384) row buffer costs no extra bytes, and the
scatter's per-row fixed cost (~4.7 ms at 400k rows, round-4 trace
fusion.9/10) is then paid once instead of twice.
"""
import time

import jax
import jax.numpy as jnp

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()

P = 403_216
N = 50_000


def bench(fn, *args, n=20):
    out = fn(*args)
    float(jnp.sum(out[0]))          # force completion (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        float(jnp.sum(out[0]) + jnp.sum(out[1]))
    return (time.perf_counter() - t0) / n * 1000


key = jax.random.key(0)
seg = jax.random.randint(jax.random.fold_in(key, 1), (P,), 0, N + 1,
                         dtype=jnp.int32)
d_rec = jax.random.normal(jax.random.fold_in(key, 2), (P, 128),
                          dtype=jnp.float32)
d_ch = jax.random.normal(jax.random.fold_in(key, 3), (P, 256),
                         dtype=jnp.float32)
d_all = jax.random.normal(jax.random.fold_in(key, 4), (P, 384),
                          dtype=jnp.float32)


@jax.jit
def two(seg, d_rec, d_ch):
    a = jax.ops.segment_sum(d_rec[:, :32], seg, num_segments=N + 1)
    b = jax.ops.segment_sum(d_ch, seg, num_segments=N + 1)
    return a, b


@jax.jit
def merged(seg, d_all):
    r = jax.ops.segment_sum(d_all, seg, num_segments=N + 1)
    return r[:, :32], r[:, 128:]


@jax.jit
def merged288(seg, d_all):
    r = jax.ops.segment_sum(d_all[:, :288], seg, num_segments=N + 1)
    return r[:, :32], r[:, 32:]


print(f"two scatters (32-of-128 + 256): {bench(two, seg, d_rec, d_ch):.2f} ms")
print(f"merged 384-lane scatter:        {bench(merged, seg, d_all):.2f} ms")
print(f"merged 288-lane scatter:        {bench(merged288, seg, d_all):.2f} ms")
