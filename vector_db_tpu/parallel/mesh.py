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
