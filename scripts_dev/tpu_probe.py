"""Dev: micro-probes for Mosaic capabilities (run on the real chip).

Probe 1: scalar read from a (S, F) VMEM block at (dynamic sublane, static
lane) — if supported, the rasterizer can use a simple per-splat loop with
rank-0 splat broadcasts and no scratch staging.
Probe 2: same read feeding an (8,128) broadcast.
Probe 3: timing of a minimal per-splat while loop (loop overhead baseline).
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gstex_tpu.utils.tpu import enable_compilation_cache

enable_compilation_cache()

S, F = 512, 32


def probe_scalar_read():
    def kernel(counts_ref, rec_ref, out_ref):
        count = counts_ref[0]

        def body(carry):
            s, acc = carry
            v = rec_ref[0, s, 5]          # dynamic sublane, static lane
            acc = acc + v * jnp.ones((8, 128), jnp.float32)
            return (s + 1, acc)

        def cond(carry):
            return carry[0] < count

        _, acc = jax.lax.while_loop(cond, body,
                                    (jnp.int32(0),
                                     jnp.zeros((8, 128), jnp.float32)))
        out_ref[0] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(4,),
        in_specs=[pl.BlockSpec((1, S, F), lambda t, c: (t, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, 128), lambda t, c: (t, 0, 0)),
    )
    rec = jnp.arange(4 * S * F, dtype=jnp.float32).reshape(4, S, F)
    counts = jnp.full((4,), 100, jnp.int32)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, 8, 128), jnp.float32),
    )(counts, rec)
    expect = float(sum(rec[0, s, 5] for s in range(100)))
    got = float(out[0, 0, 0])
    print(f"probe1 scalar-read: got {got} expect {expect} "
          f"{'OK' if abs(got-expect) < 1e-3*abs(expect) else 'MISMATCH'}",
          flush=True)


def probe_loop_speed():
    """Minimal per-splat loop: ~20 scalar reads + ~40 (8,128) vector ops."""
    def kernel(counts_ref, rec_ref, out_ref):
        count = counts_ref[pl.program_id(0)]

        def body(carry):
            s, acc, T = carry
            vs = [rec_ref[0, s, f] for f in range(20)]
            x = acc
            for i in range(0, 20, 2):
                x = x * (1.0 + vs[i] * 1e-9) + vs[i + 1] * 1e-9
                x = jnp.maximum(x, 0.0) + jnp.exp(-jnp.abs(x) * 1e-6) * 1e-9
            T = T * 0.999
            return (s + 1, x, T)

        def cond(carry):
            return jnp.logical_and(carry[0] < count,
                                   jnp.max(carry[2]) > 1e-4)

        _, acc, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.ones((8, 128), jnp.float32),
                         jnp.ones((8, 128), jnp.float32)))
        out_ref[0] = acc

    n_tiles = 625
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, S, F), lambda t, c: (t, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, 128), lambda t, c: (t, 0, 0)),
    )
    rec = jnp.ones((n_tiles, S, F), jnp.float32)
    counts = jnp.full((n_tiles,), 439, jnp.int32)

    @jax.jit
    def run(counts, rec):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
        )(counts, rec)

    out = run(counts, rec)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = run(counts, rec)
    jax.block_until_ready(out)
    ms = 1000 * (time.perf_counter() - t0) / 10
    per_splat_ns = 1e6 * ms / (n_tiles * 439)
    print(f"probe3 loop: {ms:.2f} ms for {n_tiles}x439 splats "
          f"({per_splat_ns:.0f} ns/splat-tile)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "1"):
        probe_scalar_read()
    if which in ("all", "3"):
        probe_loop_speed()
