"""Probe: per-pair grad reduction strategies at bench scale.

Compares (a) direct segment_sum in slot order (current), (b) row-gather into
gaussian-major order + segment_sum with sorted indices, (c) sorted-scatter
without gather. Rows (403216, 128) f32, 50k segments — the d_records shape.
Also measures the d_charts relayout chain vs a single XLA transpose.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()

P, L, N = 403216, 128, 50001
key = jax.random.key(0)
k1, k2 = jax.random.split(key)
rows = jax.random.normal(k1, (P, L), jnp.float32)
seg = jax.random.randint(k2, (P,), 0, N, jnp.int32)  # tile-orderish: random


def timeit(fn, *args, n=20):
    sync = jax.jit(lambda o: jax.tree.reduce(
        lambda a, b: a + b, jax.tree.map(lambda x: x.ravel()[0].astype(
            jnp.float32), o)))
    out = fn(*args)
    float(sync(out))  # one-element transfer forces completion
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        float(sync(out))
    dt = (time.perf_counter() - t0) / n * 1000
    return dt


@jax.jit
def direct(rows, seg):
    return jax.ops.segment_sum(rows, seg, num_segments=N)


@jax.jit
def gather_sorted(rows, seg):
    order = jnp.argsort(seg)          # would be precomputed in binning
    rs = rows[order]
    ss = seg[order]
    return jax.ops.segment_sum(rs, ss, num_segments=N,
                               indices_are_sorted=True)


@jax.jit
def gather_sorted_noarg(rows, order, ss):
    rs = rows[order]
    return jax.ops.segment_sum(rs, ss, num_segments=N,
                               indices_are_sorted=True)


@jax.jit
def sorted_scatter_only(rows, seg):
    return jax.ops.segment_sum(rows, seg, num_segments=N,
                               indices_are_sorted=True)  # (wrong but timed)


order = jnp.argsort(seg)
ss0 = seg[order]

print("direct segsum        :", timeit(direct, rows, seg), "ms")
print("argsort+gather+sorted:", timeit(gather_sorted, rows, seg), "ms")
print("gather+sorted (pre)  :", timeit(gather_sorted_noarg, rows, order, ss0),
      "ms")
print("sorted-flag only     :", timeit(sorted_scatter_only, rows, ss0), "ms")

# relayout chain vs single transpose at d_charts scale
U, B = 100804, 32


@jax.jit
def chain(d):
    d4 = d.reshape(U, 8, 4, B)
    d4 = d4.transpose(0, 2, 1, 3)
    return d4.reshape(P, 256)


@jax.jit
def chain_then_segsum(d, seg):
    return jax.ops.segment_sum(chain(d), seg, num_segments=N)


dch = jax.random.normal(k1, (U * 8, L), jnp.float32)
print("d_charts relayout    :", timeit(chain, dch), "ms")
print("relayout+segsum      :", timeit(chain_then_segsum, dch, seg), "ms")


# lane-sliced 4x segment_sum on the PACKED layout (no relayout): 4 narrow
# segment_sums, one per 32-lane slot column
@jax.jit
def packed_4x(d, seg):
    d3 = d.reshape(U, 8, L)
    outs = []
    for i in range(4):
        sl = d3[:, :, 32 * i:32 * (i + 1)].reshape(U * 8, 32)
        # rows U*8: each unit's 8 cw-rows; seg per unit repeated 8x
        s_i = jnp.repeat(seg.reshape(U, 4)[:, i], 8)
        outs.append(jax.ops.segment_sum(sl, s_i, num_segments=N))
    return outs


print("packed 4x segsum     :", timeit(packed_4x, dch, seg), "ms")
