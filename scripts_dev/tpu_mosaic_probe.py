"""Dev: probe Mosaic primitives the v3 kernel design depends on.

1. DMA HBM->VMEM with minor dim 32 (f32) at dynamic row offset
2. pltpu.repeat(x, n, axis=0) semantics (blocked vs interleaved)
3. dot_general (8,32)x(8,1024) contract dim0; (16,3)x(16,1024) contract dim0
4. sublane roll for cumprod
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 1024


def k_dma(hbm_ref, out_ref, buf, sem):
    t = pl.program_id(0)
    dma = pltpu.make_async_copy(
        hbm_ref.at[pl.ds(t * 16 + 8, 8), :], buf, sem)
    dma.start()
    dma.wait()
    out_ref[0] = buf[:]


def probe_dma():
    x = jnp.arange(64 * 32, dtype=jnp.float32).reshape(64, 32)
    out = pl.pallas_call(
        k_dma,
        grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 8, 32), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 8, 32), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 32), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(x)
    ref = jnp.stack([x[8:16], x[24:32]])
    print("dma32 ok:", bool(jnp.allclose(out, ref)))


def k_rep(in_ref, out_ref):
    out_ref[:] = pltpu.repeat(in_ref[:], 4, axis=0)


def probe_repeat():
    x = jnp.arange(8, dtype=jnp.float32).reshape(8, 1) * jnp.ones((8, 128))
    out = pl.pallas_call(
        k_rep,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
    )(x)
    col = np.asarray(out[:, 0]).astype(int)
    blocked = np.repeat(np.arange(8), 4)
    interleaved = np.tile(np.arange(8), 4)
    kind = ("blocked" if (col == blocked).all()
            else "interleaved" if (col == interleaved).all() else f"? {col}")
    print("repeat axis0:", kind)


def k_dots(a_ref, w_ref, r_ref, wk_ref, o1_ref, o2_ref):
    o1_ref[:] = jax.lax.dot_general(a_ref[:], w_ref[:],
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    o2_ref[:] = jax.lax.dot_general(r_ref[:], wk_ref[:],
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)


def probe_dots():
    key = jax.random.key(0)
    a = jax.random.normal(jax.random.fold_in(key, 0), (8, 32))
    w = jax.random.normal(jax.random.fold_in(key, 1), (8, P))
    r = jax.random.normal(jax.random.fold_in(key, 2), (16, 3))
    wk = jax.random.normal(jax.random.fold_in(key, 3), (16, P))
    o1, o2 = pl.pallas_call(
        k_dots,
        out_shape=[jax.ShapeDtypeStruct((32, P), jnp.float32),
                   jax.ShapeDtypeStruct((3, P), jnp.float32)],
    )(a, w, r, wk)
    print("dot (8,32)x(8,P):", bool(jnp.allclose(o1, a.T @ w, atol=1e-4)))
    print("dot (16,3)x(16,P):", bool(jnp.allclose(o2, r.T @ wk, atol=1e-4)))


def k_cumprod(q_ref, o_ref):
    q = q_ref[:]
    K = q.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, q.shape, 0)
    cp = q
    s = 1
    while s < K:
        rolled = pltpu.roll(cp, s, axis=0)
        cp = cp * jnp.where(row >= s, rolled, 1.0)
        s *= 2
    o_ref[:] = cp


def probe_cumprod():
    q = jax.random.uniform(jax.random.key(1), (16, P), jnp.float32, 0.5, 1.0)
    out = pl.pallas_call(
        k_cumprod,
        out_shape=jax.ShapeDtypeStruct((16, P), jnp.float32),
    )(q)
    ref = jnp.cumprod(q, axis=0)
    print("cumprod roll:", bool(jnp.allclose(out, ref, rtol=1e-5)))


def k_reshape_sum(x_ref, o_ref):
    x = x_ref[:]                      # (24, P)
    for c in range(3):
        o_ref[c:c + 1, :] = jnp.sum(x[c * 8:(c + 1) * 8, :], axis=0,
                                    keepdims=True)


def probe_reshape_sum():
    x = jax.random.normal(jax.random.key(2), (24, P))
    out = pl.pallas_call(
        k_reshape_sum,
        out_shape=jax.ShapeDtypeStruct((3, P), jnp.float32),
    )(x)
    ref = x.reshape(3, 8, P).sum(axis=1)
    print("block sublane reduce:", bool(jnp.allclose(out, ref, atol=1e-5)))


if __name__ == "__main__":
    probe_repeat()
    probe_dots()
    probe_cumprod()
    probe_reshape_sum()
