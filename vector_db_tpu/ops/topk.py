"""Masked top-k helpers.

The reference keeps results in Python heapqs
(src/vector_db/indexing/hnsw.py:89-134); here result sets are fixed-size
arrays merged with ``jax.lax.top_k`` / sorts so everything stays on-device
with static shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vector_db_tpu.ops.distance import BIG


def masked_top_k_smallest(
    dists: jnp.ndarray,
    ids: jnp.ndarray,
    k: int,
    valid: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k SMALLEST distances with their ids, masking invalid entries.

    dists: f32[..., N]; ids: int32[..., N] or int32[N]; valid: bool[..., N].
    Returns (f32[..., k], int32[..., k]); masked-out / overflow slots get
    (BIG, -1). Uses ``lax.top_k`` on negated distances (top_k selects
    largest).
    """
    if valid is not None:
        dists = jnp.where(valid, dists, BIG)
    neg, pos = jax.lax.top_k(-dists, k)
    top_d = -neg
    ids_b = jnp.broadcast_to(ids, dists.shape)
    top_i = jnp.take_along_axis(ids_b, pos, axis=-1)
    top_i = jnp.where(top_d >= BIG, -1, top_i)
    return top_d, top_i


def merge_top_k(
    d_a: jnp.ndarray,
    i_a: jnp.ndarray,
    d_b: jnp.ndarray,
    i_b: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge two (dists, ids) top-k sets along the last axis into one top-k."""
    d = jnp.concatenate([d_a, d_b], axis=-1)
    i = jnp.concatenate([i_a, i_b], axis=-1)
    return masked_top_k_smallest(d, i, k)
