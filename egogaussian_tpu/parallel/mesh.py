"""Device mesh and sharding helpers.

The reference has NO distributed layer (SURVEY.md §2.3: single GPU, no
torch.distributed/NCCL anywhere; parallelism across videos = separate SLURM
jobs). This package is the TPU build's first-class replacement:

  * `data` axis  — frame-data parallelism: each device rasterizes different
    cameras against replicated Gaussians; gradients are psum'd over ICI by
    XLA (the NCCL-allreduce equivalent, emitted automatically from
    shardings).
  * `scene` axis — multi-scene parallelism: the reference's
    one-SLURM-job-per-video becomes one mesh row per scene in a single
    process (BASELINE.json config 5).

Shardings are expressed with jax.sharding.NamedSharding so the same jitted
step runs single-chip (trivial mesh) or multi-chip unchanged.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_scene: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with axes (scene, data). Defaults to all devices on the data
    axis. Lay the data axis innermost so frame-gradient psums ride ICI
    neighbors."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_scene
    assert n_scene * n_data == len(devices), (
        f"{n_scene} x {n_data} != {len(devices)} devices"
    )
    arr = np.array(devices).reshape(n_scene, n_data)
    return Mesh(arr, axis_names=("scene", "data"))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Shard a pytree's leading axis across `axis` (frames across devices)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)
