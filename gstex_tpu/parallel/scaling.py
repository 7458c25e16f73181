"""Analytic multi-chip scaling model for the tile-row sharded train step.

BASELINE.md demands >=85% multi-host scaling efficiency; real multi-chip
hardware is absent in this environment, so the argument is made the way
the scaling literature does (jax-ml.github.io/scaling-book recipe: count
the bytes each collective moves, divide by the interconnect bandwidth,
compare against the compute the collective hides behind):

Per optimizer step, ``parallel/shard._sharded_step_core`` issues exactly
two classes of collectives (the reference's analog is one NCCL
all-reduce over the same gradient payload per DDP iteration,
``scripts/train.py:138-151``):

1. **grad psum** over the full ``GStexParams`` pytree — the texture
   charts dominate (N * Ch * Cw * 3 f32). A bidirectional-ring
   all-reduce moves ``2 * bytes * (n-1)/n`` per chip.
2. **SSIM halo ppermute** — ``_HALO`` rows of the band frame
   (10 * W * 3 f32), three orders of magnitude smaller.

Scalar loss psums are O(n) * 4 bytes — noise.

Everything else (binning, rasterization, loss) is band-local: compute
per chip shrinks ~1/n while the psum payload stays constant, which is
why the model below predicts the efficiency cliff only where
``step_compute/n ~ psum_time``.

``tests/test_scaling.py`` asserts the byte accounting against the real
pytree, and ``scripts_dev/mesh_weakscale.py`` measures the CPU-mesh
weak-scaling curve (correctness of the collective pattern, not ICI
timing).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np

# v5e ICI: 4 links/chip in the 2D torus at ~50 GB/s usable each
# direction => ~100 GB/s effective ring all-reduce bandwidth per chip
# (the public "How to Scale Your Model" v5e numbers: 4.5e10 B/s
# unidirectional per link, 2 links per ring axis).
V5E_ICI_ALLREDUCE_GBPS = 90.0
# DCN per host (8 chips/host on v5e): ~25 GB/s => the multi-host psum
# leg runs at DCN speed for the inter-host fraction of the ring
DCN_GBPS = 25.0


def _tree_bytes(tree) -> int:
    return int(sum(np.prod(l.shape) * l.dtype.itemsize
                   for l in jax.tree.leaves(tree)))


class CommVolume(NamedTuple):
    grad_psum_bytes: int      # full param-grad pytree, psum'd once/step
    halo_bytes: int           # SSIM ppermute payload per step
    per_chip_allreduce_bytes: int  # ring traffic per chip (n devices)


def comm_volume(params, width: int, ndev: int,
                halo_rows: int = 10) -> CommVolume:
    """Bytes each collective moves per train step on an ndev-chip mesh."""
    grad_bytes = _tree_bytes(params)
    halo = halo_rows * width * 3 * 4
    ring = int(2 * grad_bytes * (ndev - 1) / max(ndev, 1))
    return CommVolume(grad_psum_bytes=grad_bytes, halo_bytes=halo,
                      per_chip_allreduce_bytes=ring)


def predicted_efficiency(step_ms_single: float, params, width: int,
                         ndev: int, ici_gbps: float = V5E_ICI_ALLREDUCE_GBPS,
                         overlap: float = 0.0) -> dict:
    """Weak upper/lower bounds on scaling efficiency at ndev chips.

    ``step_ms_single``: measured single-chip fwd+bwd+optim step time (the
    bench number). Compute shards ~1/ndev (tile rows); the psum payload
    does not. ``overlap`` in [0, 1] is the fraction of psum hidden behind
    the next step's binning (the scanned step overlaps collectives;
    0 = fully exposed is the conservative bound).
    """
    cv = comm_volume(params, width, ndev)
    comm_ms = cv.per_chip_allreduce_bytes / (ici_gbps * 1e9) * 1e3
    compute_ms = step_ms_single / ndev
    exposed = comm_ms * (1.0 - overlap)
    eff = compute_ms / (compute_ms + exposed)
    return {
        "ndev": ndev,
        "compute_ms": round(compute_ms, 3),
        "allreduce_ms": round(comm_ms, 3),
        "exposed_comm_ms": round(exposed, 3),
        "efficiency": round(eff, 4),
        "grad_psum_mb": round(cv.grad_psum_bytes / 1e6, 2),
        "halo_kb": round(cv.halo_bytes / 1e3, 1),
    }
