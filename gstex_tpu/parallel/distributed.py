"""Multi-host initialization and mesh construction.

The TPU-native replacement for the reference's process-group bootstrap
(``nerfstudio/scripts/train.py:103-157``: mp.spawn + NCCL rendezvous +
``MachineConfig`` machine_rank/num_machines/dist_url): one call to
``jax.distributed.initialize`` per host (coordinator address + process id),
then a global ``Mesh`` over every chip in the slice. No explicit barriers —
collectives are compiled into the step (SURVEY.md §2.3).

Usage on each host of a pod slice:
    init_distributed(coordinator="host0:8476", num_processes=H, process_id=i)
    mesh = tile_mesh()                 # all chips, tile-row axis
    step = make_sharded_train_step(cfg, tx, mesh, H, W)

On TPU pods with the standard runtime, ``jax.distributed.initialize()`` with
no args autodetects everything.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Initialize jax.distributed (idempotent; no-op single-process)."""
    if num_processes in (None, 1) and coordinator is None:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process / already initialized
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def tile_mesh(devices=None, axis_name: str = "tile") -> Mesh:
    """1-D mesh over all (global) devices for tile-row sharding."""
    devices = np.array(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis_name,))


def data_tile_mesh(num_data: int, axis_names=("data", "tile")) -> Mesh:
    """2-D mesh: camera batches over 'data' (typically hosts/DCN), tile rows
    over 'tile' (ICI). Collectives for the image axis ride ICI."""
    devices = np.array(jax.devices())
    assert devices.size % num_data == 0
    return Mesh(devices.reshape(num_data, -1), axis_names)


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
