"""HNSW-over-PQ hybrid: ADC traversal + exact rerank."""

import random

import numpy as np
import pytest

from vector_db_tpu.index.hnsw import HNSW


def test_pq_search_recall(rng):
    n, dim = 400, 32
    x = rng.standard_normal((n, dim)).astype(np.float32)
    index = HNSW(M=8, ef_construction=50, rng=random.Random(42),
                 capacity=512, l_max=4)
    index.insert_arrays(list(range(n)), x, batch_size=400)
    index.enable_pq(chunks=8, ksub=32)

    q = rng.standard_normal((10, dim)).astype(np.float32)
    d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d, axis=1)[:, :5]

    _, exact_ids = index.search_batch(q, k=5, ef=50)
    _, pq_ids = index.search_batch_pq(q, k=5, ef=50)

    rec_exact = np.mean([len(set(exact_ids[i]) & set(gt[i])) / 5
                         for i in range(10)])
    rec_pq = np.mean([len(set(pq_ids[i]) & set(gt[i])) / 5
                      for i in range(10)])
    assert rec_pq >= rec_exact - 0.2  # ADC traversal costs a little recall
    assert rec_pq >= 0.5


def test_pq_self_query_with_rerank(rng):
    n, dim = 200, 16
    x = rng.standard_normal((n, dim)).astype(np.float32)
    index = HNSW(M=8, ef_construction=40, rng=random.Random(42),
                 capacity=256, l_max=4)
    index.insert_arrays(list(range(n)), x, batch_size=200)
    index.enable_pq(chunks=4, ksub=16)
    dists, ids = index.search_batch_pq(x[:5], k=1, ef=40, rerank=True)
    np.testing.assert_array_equal(ids[:, 0], np.arange(5))
    # rerank means exact distances: self-distance ~0
    assert np.all(dists[:, 0] < 1e-3)


def test_pq_requires_enable(rng):
    index = HNSW(M=4, ef_construction=20, rng=random.Random(42))
    with pytest.raises(ValueError, match="enable_pq"):
        index.search_batch_pq(np.zeros((1, 8), np.float32), k=1)
