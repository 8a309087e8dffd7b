"""Device mesh helpers.

The reference's only scale-out story is docker-compose ``replicas`` — full
index copies with no sharding (README.md:123-126, docker-compose.yml:48-50).
Here scale-out is true sharding over a ``jax.sharding.Mesh``: the corpus
(embedding table + neighbor tables + inverted lists) splits by row across
the ``shard`` axis, per-shard search runs SPMD under ``shard_map``, and
results merge with XLA collectives over ICI (``all_gather`` + top-k), not
HTTP.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

SHARD_AXIS = "shard"
SLICE_AXIS = "slice"


def shard_axis() -> str:
    return SHARD_AXIS


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over ``n_devices`` (default: all visible devices)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"Requested {n_devices} devices, only {len(devices)} visible"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (SHARD_AXIS,))


def make_mesh_2d(n_slices: int, shards_per_slice: int,
                 devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """2-D mesh ("slice", "shard") for multi-slice (DCN) deployments.

    The inner ``shard`` axis maps to devices within one TPU slice (ICI);
    the outer ``slice`` axis crosses slices over DCN. Collectives written
    per-axis then ride the right fabric: sharded-search merges all_gather
    over "shard" first (fast ICI, S_inner·B·k pairs) and only the per-slice
    winners — B·k pairs — cross "slice"/DCN. On hosts this simulates with
    virtual devices; on hardware pass the slice-ordered device list.
    """
    if devices is None:
        devices = jax.devices()
    need = n_slices * shards_per_slice
    if need > len(devices):
        raise ValueError(
            f"Requested {need} devices, only {len(devices)} visible"
        )
    grid = np.array(devices[:need]).reshape(n_slices, shards_per_slice)
    return Mesh(grid, (SLICE_AXIS, SHARD_AXIS))
