"""Cluster-partitioned kNN construction vs exact kNN."""

import numpy as np

from vector_db_tpu.index.hnsw import _clustered_forward


def test_clustered_forward_edge_quality(rng):
    # low intrinsic dim so neighborhoods are meaningful
    n, dim = 3000, 32
    u = rng.standard_normal((n, 8)).astype(np.float32)
    v = rng.standard_normal((8, dim)).astype(np.float32)
    x = (u @ v + 0.05 * rng.standard_normal((n, dim))).astype(np.float32)

    fwd_d, fwd_i = _clustered_forward(x, deg=8, seed=0)
    assert fwd_i.shape == (n, 8)

    # exact ground truth
    sq = (x * x).sum(1)
    d = sq[:, None] - 2 * (x @ x.T) + sq[None, :]
    np.fill_diagonal(d, np.inf)
    gt = np.argsort(d, axis=1)[:, :8]

    recall = np.mean(
        [len(set(fwd_i[i][fwd_i[i] >= 0]) & set(gt[i])) / 8 for i in range(n)]
    )
    # partitioned kNN with spill=2 should recover the vast majority of
    # exact neighbors
    assert recall >= 0.8, recall

    # distances reported must match true distances for found pairs
    i, j = 5, fwd_i[5][0]
    true = ((x[i] - x[j]) ** 2).sum()
    assert abs(fwd_d[5][0] - true) < 1e-2 * max(1.0, true)


def test_clustered_forward_no_self_edges(rng):
    n, dim = 2000, 16
    x = rng.standard_normal((n, dim)).astype(np.float32)
    _, fwd_i = _clustered_forward(x, deg=4, seed=1)
    for i in range(0, n, 97):
        assert i not in fwd_i[i]


def test_occlusion_prune_tiled_matches_unitary(rng):
    import jax.numpy as jnp

    from vector_db_tpu.ops.graph_build import (
        occlusion_prune,
        occlusion_prune_tiled,
    )

    n, dim, k, deg = 512, 16, 12, 6
    x = rng.standard_normal((n, dim)).astype(np.float32)
    sq = (x * x).sum(1)
    d = sq[:, None] - 2 * (x @ x.T) + sq[None, :]
    np.fill_diagonal(d, np.inf)
    order = np.argsort(d, axis=1)[:, :k]
    fwd_i = order.astype(np.int32)
    fwd_d = np.take_along_axis(d, order, axis=1).astype(np.float32)

    td, ti = occlusion_prune_tiled(
        jnp.asarray(x), jnp.asarray(fwd_d), jnp.asarray(fwd_i),
        deg=deg, chunk=128, alpha=1.2)
    rd, ri = occlusion_prune(
        jnp.asarray(fwd_d), jnp.asarray(fwd_i),
        jnp.asarray(x[np.maximum(fwd_i, 0)]), deg=deg, alpha=1.2)
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(ri))

    # alpha-occlusion always keeps the closest candidate, rows stay full
    ti = np.asarray(ti)
    assert (ti[:, 0] == fwd_i[:, 0]).all()
    assert (ti >= 0).all()
    # selection diversifies: some row must differ from plain closest-deg
    assert (ti != fwd_i[:, :deg]).any()


def test_bulk_build_clustered_device_branch(rng, monkeypatch):
    """Force the fully-device-resident clustered bulk path (normally only
    taken above 262144 rows) on a small corpus and check graph quality +
    agreement with the exact-kNN branch's search behavior."""
    import random

    import vector_db_tpu.index.hnsw as H

    monkeypatch.setattr(H, "BULK_EXACT_THRESHOLD", 512)
    monkeypatch.setattr(H, "BULK_HOST_THRESHOLD", 256)

    n, dim, k = 3000, 32, 5
    u = rng.standard_normal((n, 8)).astype(np.float32)
    v = rng.standard_normal((8, dim)).astype(np.float32)
    x = (u @ v + 0.05 * rng.standard_normal((n, dim))).astype(np.float32)

    index = H.HNSW(M=8, ef_construction=50, rng=random.Random(42),
                   capacity=n, l_max=4)
    index.bulk_build(list(range(n)), x)

    q = x[:20] + 0.01 * rng.standard_normal((20, dim)).astype(np.float32)
    sq = (x * x).sum(1)
    d = sq[None, :, ] - 2 * (q @ x.T) + (q * q).sum(1)[:, None]
    gt = np.argsort(d, axis=1)[:, :k]
    _, ids = index.search_batch(q, k=k, ef=100)
    recall = np.mean([len(set(ids[i][ids[i] >= 0].tolist())
                          & set(gt[i].tolist())) / k for i in range(20)])
    assert recall >= 0.9, recall


def test_bulk_build_clustered_alpha_prune_branch(rng, monkeypatch):
    import random

    import vector_db_tpu.index.hnsw as H

    monkeypatch.setattr(H, "BULK_EXACT_THRESHOLD", 512)
    n, dim, k = 1500, 16, 5
    x = rng.standard_normal((n, dim)).astype(np.float32)
    index = H.HNSW(M=8, ef_construction=50, rng=random.Random(42),
                   capacity=n, l_max=3)
    index.bulk_build(list(range(n)), x, alpha=1.1)
    _, ids = index.search_batch(x[:8], k=1, ef=50)
    np.testing.assert_array_equal(ids[:, 0], np.arange(8))
