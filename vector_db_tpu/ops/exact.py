"""Exact (brute-force) k-NN search as fused matmul + top-k.

This is the recall ground-truth path and the "flat index" the reference
lacks. One MXU matmul scores a whole query batch against the corpus; for
corpora too large for a single product matrix, the corpus is tiled with
``lax.scan`` and per-tile top-k results are merged (running top-k), so HBM
traffic is one streaming pass over the embedding table.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from vector_db_tpu.ops.distance import BIG, l2_sq_pairwise, squared_norms
from vector_db_tpu.ops.topk import masked_top_k_smallest, merge_top_k


@partial(jax.jit, static_argnames=("k",))
def exact_search(
    queries: jnp.ndarray,
    emb: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k by squared L2, single-tile.

    queries: f32[B, d]; emb: f32[N, d]; valid: bool[N].
    Returns (dists_sq f32[B, k], slot ids int32[B, k]); invalid slots never
    appear (padded with (BIG, -1) when fewer than k valid rows exist).
    """
    d = l2_sq_pairwise(queries, emb)
    ids = jnp.arange(emb.shape[0], dtype=jnp.int32)
    return masked_top_k_smallest(d, ids, k, valid=valid[None, :])


@partial(jax.jit, static_argnames=("k", "tile"))
def exact_search_tiled(
    queries: jnp.ndarray,
    emb: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    tile: int = 65536,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k with the corpus streamed in tiles.

    Same contract as :func:`exact_search`; corpus rows are processed ``tile``
    at a time under ``lax.scan`` with a running top-k merge, so peak memory is
    O(B * tile) instead of O(B * N). ``N`` must be a multiple of ``tile``
    after padding (callers pad with ``valid=False`` rows).
    """
    n, dim = emb.shape
    b = queries.shape[0]
    pad = (-n) % tile
    if pad:
        emb = jnp.concatenate([emb, jnp.zeros((pad, dim), emb.dtype)], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)
    n_tiles = emb.shape[0] // tile

    emb_t = emb.reshape(n_tiles, tile, dim)
    valid_t = valid.reshape(n_tiles, tile)
    x_sq_t = squared_norms(emb_t)  # [n_tiles, tile]
    base_ids = jnp.arange(tile, dtype=jnp.int32)

    init = (
        jnp.full((b, k), BIG, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )

    def body(carry, xs):
        best_d, best_i = carry
        tile_emb, tile_valid, tile_xsq, tile_idx = xs
        d = l2_sq_pairwise(queries, tile_emb, x_sq=tile_xsq)
        d = jnp.where(tile_valid[None, :], d, BIG)
        ids = base_ids + tile_idx * tile
        td, ti = masked_top_k_smallest(d, ids, min(k, tile))
        return merge_top_k(best_d, best_i, td, ti, k), None

    (best_d, best_i), _ = jax.lax.scan(
        body,
        init,
        (emb_t, valid_t, x_sq_t, jnp.arange(n_tiles, dtype=jnp.int32)),
    )
    return best_d, best_i


@partial(jax.jit, static_argnames=("k", "tile"))
def knn_exact(
    queries: jnp.ndarray,
    q_ids: jnp.ndarray,
    emb: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    tile: int = 16384,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN of corpus members against the corpus, excluding self.

    queries: f32[B, d] (rows OF the corpus); q_ids: int32[B] their slot ids;
    emb/valid: the corpus. Returns (dists_sq f32[B, k], slots int32[B, k]).
    This is the bulk-graph-construction primitive: one streaming pass of
    MXU matmuls builds exact neighbor tables for a whole node batch.
    """
    n, dim = emb.shape
    b = queries.shape[0]
    pad = (-n) % tile
    if pad:
        emb = jnp.concatenate([emb, jnp.zeros((pad, dim), emb.dtype)], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)
    n_tiles = emb.shape[0] // tile
    emb_t = emb.reshape(n_tiles, tile, dim)
    valid_t = valid.reshape(n_tiles, tile)
    x_sq_t = squared_norms(emb_t)
    base_ids = jnp.arange(tile, dtype=jnp.int32)

    init = (
        jnp.full((b, k), BIG, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )

    def body(carry, xs):
        best_d, best_i = carry
        tile_emb, tile_valid, tile_xsq, tile_idx = xs
        d = l2_sq_pairwise(queries, tile_emb, x_sq=tile_xsq)
        ids = base_ids + tile_idx * tile
        d = jnp.where(tile_valid[None, :], d, BIG)
        d = jnp.where(ids[None, :] == q_ids[:, None], BIG, d)  # exclude self
        td, ti = masked_top_k_smallest(d, ids, min(k, tile))
        return merge_top_k(best_d, best_i, td, ti, k), None

    (best_d, best_i), _ = jax.lax.scan(
        body, init,
        (emb_t, valid_t, x_sq_t, jnp.arange(n_tiles, dtype=jnp.int32)),
    )
    return best_d, best_i
