"""Dev: micro-timing of binning sub-ops on the real chip."""

import time

import jax
import jax.numpy as jnp

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()

N = 50_000
PAIR_CAP = 1 << 20
NT = 625
S_MAX = 512

key = jax.random.key(0)
ks = jax.random.split(key, 8)
depths = jax.random.uniform(ks[0], (N,), jnp.float32, 1.0, 10.0)
counts = jax.random.randint(ks[1], (N,), 0, 10).astype(jnp.int32)
tile_rand = jax.random.randint(ks[2], (PAIR_CAP,), 0, NT).astype(jnp.int32)
depth_k = jax.random.uniform(ks[3], (PAIR_CAP,), jnp.float32)
gid_r = jax.random.randint(ks[4], (PAIR_CAP,), 0, N).astype(jnp.int32)
cov = jax.random.bernoulli(ks[5], 0.01, (N, NT)).astype(jnp.int32)
table = jnp.cumsum(cov.reshape(-1)).reshape(N, NT)


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timeit(name, fn, *args, iters=5):
    f = jax.jit(fn)
    out = f(*args)
    sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
        sync(jax.tree.leaves(out)[0])
    ms = 1000 * (time.perf_counter() - t0) / iters
    print(f"{name:34s} {ms:8.2f} ms", flush=True)
    return out


timeit("argsort N=50k", lambda d: jnp.argsort(d), depths)
timeit("lax.sort 1M 3keys",
       lambda t, d, g: jax.lax.sort((t, d, g), num_keys=3),
       tile_rand, depth_k, gid_r)
timeit("lax.sort 1M 1key",
       lambda t: jax.lax.sort((t,), num_keys=1), tile_rand)

def ss(c, n_rep=1):
    off = jnp.cumsum(c)
    k = jnp.arange(PAIR_CAP, dtype=jnp.int32)
    return jnp.searchsorted(off, k, side="right")

timeit("searchsorted 1M into 50k", ss, counts)

def cum_chunk(c):
    pad = (-c.shape[0]) % 256
    cp = jnp.pad(c, ((0, pad), (0, 0))).reshape(-1, 256, NT)
    return jnp.cumsum(cp, axis=1)

timeit("chunked cumsum (pad,256,625)", cum_chunk, cov)

def segids(c):
    off = jnp.cumsum(c) - c
    g = jnp.arange(N, dtype=jnp.int32)
    mark = jnp.zeros((PAIR_CAP,), jnp.int32).at[
        jnp.where(c > 0, off, PAIR_CAP)].set(g + 1, mode="drop")
    return jax.lax.cummax(mark) - 1

timeit("segment-ids scatter+cummax 1M", segids, counts)

def cov_build(tx0, tw):
    xs = jnp.arange(NT, dtype=jnp.int32)
    return jnp.logical_and(tx0[:, None] <= xs,
                           xs < (tx0 + tw)[:, None]).astype(jnp.int32)

timeit("cov build (N,NT) compare", cov_build,
       jax.random.randint(ks[6], (N,), 0, NT).astype(jnp.int32), counts)

timeit("gather 1M from (N,NT) table",
       lambda t, g, ti: t.reshape(-1)[g * NT + ti], table, gid_r, tile_rand)

timeit("scatter 1M set",
       lambda g, ti: jnp.zeros((NT * S_MAX,), jnp.int32)
       .at[jnp.minimum(ti * S_MAX + (g % S_MAX), NT * S_MAX)]
       .set(g, mode="drop"),
       gid_r, tile_rand)

timeit("gather 1M x5 from (N,) cols",
       lambda g, d: (d[g], d[g] * 2, d[g] + 1, d[g] - 1, d[g] * 3),
       gid_r, depths)
