"""Calibrate VPU throughput: cycles per (16,1024) elementwise op by type.

A standalone pallas kernel loops a chain of ops over a VMEM block; timing
many iterations isolates per-op cost (loop overhead amortized by CHAIN).
"""
import functools
import time
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from gstex_tpu.utils.tpu import enable_compilation_cache
enable_compilation_cache()

SHAPE = (16, 1024)
ITERS = 2000          # while-loop iterations inside the kernel
CHAIN = 32            # ops per iteration


def kernel(op, x_ref, o_ref):
    def body(carry):
        i, v = carry
        for _ in range(CHAIN):
            v = op(v)
        return (i + 1, v)

    def cond(c):
        return c[0] < ITERS

    _, v = jax.lax.while_loop(cond, body, (jnp.int32(0), x_ref[...]))
    o_ref[...] = v


def run(name, op):
    f = pl.pallas_call(
        functools.partial(kernel, op),
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
    )
    x = jnp.full(SHAPE, 0.5, jnp.float32)
    g = jax.jit(f)
    r = g(x); float(r[0, 0])
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        r = g(x); float(r[0, 0])
    dt = (time.perf_counter() - t0) / reps
    total_ops = ITERS * CHAIN
    ns = dt * 1e9 / total_ops
    print(f"{name:14s} {ns:7.2f} ns/op on (16,1024) "
          f"({ns * 0.94:5.1f} cyc @0.94GHz)", flush=True)


run("mul+add (fma)", lambda v: v * 1.0001 + 1e-6)
run("mul", lambda v: v * 1.0001)
run("exp", lambda v: jnp.exp(v * 1e-6))
run("div", lambda v: 1.0 / (v + 1.5))
run("where", lambda v: jnp.where(v > 0.2, v * 1.0001, v))
run("max", lambda v: jnp.maximum(v * 1.0001, 0.1))
run("roll", lambda v: pltpu.roll(v, 1, axis=0) * 1.0001)
run("rowsum_rep", lambda v: v + jnp.sum(v, axis=0, keepdims=True) * 1e-7)

# --- throughput variant: ILP chains -------------------------------------

def kernel_ilp(op, n_chains, x_ref, o_ref):
    def body(carry):
        i, vs = carry
        for _ in range(CHAIN):
            vs = tuple(op(v) for v in vs)
        return (i + 1, vs)

    def cond(c):
        return c[0] < ITERS

    vs0 = tuple(x_ref[...] * (1.0 + 0.01 * j) for j in range(n_chains))
    _, vs = jax.lax.while_loop(cond, body, (jnp.int32(0), vs0))
    acc = vs[0]
    for v in vs[1:]:
        acc = acc + v
    o_ref[...] = acc


def run_ilp(name, op, n_chains):
    f = pl.pallas_call(
        functools.partial(kernel_ilp, op, n_chains),
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
    )
    x = jnp.full(SHAPE, 0.5, jnp.float32)
    g = jax.jit(f)
    r = g(x); float(r[0, 0])
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        r = g(x); float(r[0, 0])
    dt = (time.perf_counter() - t0) / reps
    total_ops = ITERS * CHAIN * n_chains
    ns = dt * 1e9 / total_ops
    print(f"{name:10s} ilp={n_chains}  {ns:7.2f} ns/op "
          f"({ns * 0.94:5.1f} cyc, {ns * 0.94 / 16:4.1f} cyc/vreg)",
          flush=True)


for ilp in (2, 4, 8):
    run_ilp("fma", lambda v: v * 1.0001 + 1e-6, ilp)
run_ilp("exp", lambda v: jnp.exp(v * 1e-6), 4)
run_ilp("div", lambda v: 1.0 / (v + 1.5), 4)

for ilp in (16, 32):
    run_ilp("fma", lambda v: v * 1.0001 + 1e-6, ilp)
