"""Projected-traversal HNSW (pHNSW-style): PCA bf16 mirror beam + exact
rerank. Same search contract as HNSW.search_batch (reference semantics
src/vector_db/indexing/hnsw.py:330-374); the mirror is a pure traversal
optimization."""

import random

import numpy as np
import pytest

from vector_db_tpu.index.hnsw import HNSW
from vector_db_tpu.types import Node


def _lowrank(n, dim, rank, rng):
    u = rng.standard_normal((n, rank)).astype(np.float32)
    v = rng.standard_normal((rank, dim)).astype(np.float32)
    x = u @ v + 0.05 * rng.standard_normal((n, dim)).astype(np.float32)
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


def test_rp_traversal_matches_f32(rng):
    """With dims >= intrinsic rank, projected traversal must match f32
    traversal recall (the estimator error 2q_⊥·x_⊥ vanishes in-span)."""
    data = _lowrank(2048 + 32, 96, 16, rng)
    x, q = data[:2048], data[2048:]
    gt = np.argsort(((x[None, :, :] - q[:, None, :]) ** 2).sum(-1),
                    axis=1)[:, :10]
    index = HNSW(M=16, ef_construction=80, rng=random.Random(42),
                 capacity=2048, l_max=4)
    index.bulk_build(list(range(2048)), x)
    index.enable_rp(dims=32)

    def rec(ids):
        return np.mean([len(set(ids[i, :10].tolist()) & set(gt[i])) / 10
                        for i in range(32)])

    _, ids_f = index.search_batch(q, k=10, ef=80, expand=4)
    _, ids_rp = index.search_batch_rp(q, k=10, ef=80, expand=4)
    assert rec(ids_rp) >= rec(ids_f) - 0.02

    # rerank distances are exact f32: self-query distance ~0
    d, ids = index.search_batch_rp(x[:4], k=1, ef=32)
    np.testing.assert_array_equal(ids[:, 0], np.arange(4))
    assert np.all(d[:, 0] < 1e-2)


def test_rp_mirror_tracks_mutations(rng):
    """Inserts after enable_rp must be findable via projected traversal
    (the mirror re-projects lazily on table identity change)."""
    data = _lowrank(512 + 1, 64, 8, rng)
    x, extra = data[:512], data[512]
    index = HNSW(M=8, ef_construction=50, rng=random.Random(42),
                 capacity=1024, l_max=4)
    index.bulk_build(list(range(512)), x)
    index.enable_rp(dims=16)
    index.search_batch_rp(x[:1], k=1, ef=16)  # build mirror
    index.insert_node(Node(id=9999, embedding=extra, metadata={}))
    d, ids = index.search_batch_rp(extra[None, :], k=1, ef=32)
    assert ids[0, 0] == 9999
    assert d[0, 0] < 1e-2


def test_rp_requires_enable(rng):
    index = HNSW(M=4, ef_construction=20, rng=random.Random(42))
    with pytest.raises(ValueError, match="enable_rp"):
        index.search_batch_rp(np.zeros((1, 8), np.float32), k=1)
