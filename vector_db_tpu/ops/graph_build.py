"""Bulk graph-construction ops: batched occlusion pruning + reverse edges.

The reference selects neighbors as the naive closest-M
(src/vector_db/indexing/hnsw.py:136-141 — no paper heuristic). For bulk
builds this module implements the HNSW-paper / DiskANN occlusion rule as a
batched device kernel: a candidate c (in ascending distance order) is
dropped when an already-selected s is closer to c than c is to the query
node, i.e. ``d(c, s) < alpha * d(c, q)`` — edges then spread across
directions instead of bunching inside one tight cluster. Pruned-out slots
are refilled with the closest rejected candidates (keep-pruned-connections),
so rows stay at full degree.

All pairwise candidate distances come from one batched matmul per node
chunk; the selection scan is a static unroll over K candidates of [C, K]
vector ops.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from vector_db_tpu.ops.distance import BIG
from vector_db_tpu.ops.topk import masked_top_k_smallest


@functools.partial(jax.jit, static_argnames=("deg",))
def occlusion_prune(
    cand_d: jnp.ndarray,    # f32[C, K] ascending (BIG = padding)
    cand_i: jnp.ndarray,    # int32[C, K] (-1 = padding)
    cand_emb: jnp.ndarray,  # f32[C, K, dim] candidate embeddings
    deg: int,
    alpha: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select up to ``deg`` diverse neighbors per node; refill to ``deg``
    with the closest rejected candidates. Returns (d f32[C, deg],
    ids int32[C, deg]), ascending, (BIG, -1) padded."""
    c, k = cand_d.shape
    # pairwise distances among candidates: ||a-b||^2 via batched matmul
    sq = jnp.sum(cand_emb * cand_emb, axis=-1)  # [C, K]
    cross = jnp.einsum(
        "ckd,cld->ckl", cand_emb, cand_emb,
        preferred_element_type=jnp.float32,
    )
    pair = jnp.maximum(sq[:, :, None] - 2.0 * cross + sq[:, None, :], 0.0)

    sel_mask = jnp.zeros((c, k), bool)
    cnt = jnp.zeros((c,), jnp.int32)
    for j in range(k):
        # occluded: some selected s has d(c_j, s) < alpha * d(c_j, q)
        occ = jnp.any(
            sel_mask & (pair[:, j, :] < alpha * cand_d[:, j : j + 1]),
            axis=1,
        )
        ok = (cand_i[:, j] >= 0) & (cand_d[:, j] < BIG) & (cnt < deg) & ~occ
        sel_mask = sel_mask.at[:, j].set(ok)
        cnt = cnt + ok.astype(jnp.int32)

    # selected first (by distance), then closest rejected as fill
    offset = jnp.float32(1.0e30)  # >> any real distance, << BIG (no overflow)
    key = jnp.where(sel_mask, cand_d - offset, cand_d)
    key = jnp.where(cand_i >= 0, key, BIG)
    sel_key, sel_i = masked_top_k_smallest(key, cand_i, deg)
    sel_d = jnp.where(sel_key < -offset / 2, sel_key + offset, sel_key)
    return sel_d, sel_i
