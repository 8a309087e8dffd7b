"""IVF tests mirroring the reference's (tests/indexing/test_ivf.py):
recall vs brute force, error paths, cluster stats, persistence."""

import numpy as np
import pytest

from vector_db_tpu.index.ivf import IvfIndex
from vector_db_tpu.storage import InMemoryNodeStorage
from vector_db_tpu.types import Node


def make_nodes(rng, n, dim):
    return [
        Node(id=i, embedding=rng.standard_normal(dim).astype(np.float32))
        for i in range(n)
    ]


def brute_force_ids(nodes, q, k):
    d = np.array([np.linalg.norm(q - n.embedding) for n in nodes])
    return [nodes[i].id for i in np.argsort(d)[:k]]


@pytest.fixture
def built(rng):
    nodes = make_nodes(rng, 100, 16)
    index = IvfIndex(k=4)
    index.build_index(nodes)
    return index, nodes


def test_k_must_be_positive():
    with pytest.raises(ValueError):
        IvfIndex(k=0)


def test_build_empty_raises():
    with pytest.raises(ValueError):
        IvfIndex(k=2).build_index([])


def test_build_too_few_raises(rng):
    with pytest.raises(ValueError):
        IvfIndex(k=10).build_index(make_nodes(rng, 5, 8))


def test_search_before_build_raises():
    with pytest.raises(ValueError, match="built"):
        IvfIndex(k=2).search(np.zeros(4, np.float32), n_probe=1, top_k=1)


def test_add_before_build_raises(rng):
    with pytest.raises(ValueError, match="built"):
        IvfIndex(k=2).add(make_nodes(rng, 1, 8)[0])


def test_n_probe_bounds(built):
    index, _ = built
    q = np.zeros(16, np.float32)
    with pytest.raises(ValueError):
        index.search(q, n_probe=0, top_k=1)
    with pytest.raises(ValueError):
        index.search(q, n_probe=5, top_k=1)


def test_dim_mismatch_raises(built):
    index, _ = built
    with pytest.raises(ValueError, match="dimension"):
        index.search(np.zeros(8, np.float32), n_probe=2, top_k=1)


def test_exact_match_self_query(built):
    index, nodes = built
    results = index.search(nodes[11].embedding, n_probe=4, top_k=1)
    assert results[0][0].id == 11
    assert results[0][1] < 1e-3


def test_recall_vs_brute_force(built, rng):
    # Reference contract: recall@5 >= 0.6 on >= 70% of 10 queries
    # (tests/indexing/test_ivf.py:141-167).
    index, nodes = built
    ok = 0
    for _ in range(10):
        q = rng.standard_normal(16).astype(np.float32)
        got = {n.id for n, _ in index.search(q, n_probe=4, top_k=5)}
        want = set(brute_force_ids(nodes, q, 5))
        if len(got & want) / 5 >= 0.6:
            ok += 1
    assert ok >= 7


def test_full_probe_equals_brute_force(built, rng):
    # Probing every cluster must be exact.
    index, nodes = built
    q = rng.standard_normal(16).astype(np.float32)
    got = [n.id for n, _ in index.search(q, n_probe=4, top_k=10)]
    assert got == brute_force_ids(nodes, q, 10)


def test_add_after_build(built, rng):
    index, nodes = built
    v = rng.standard_normal(16).astype(np.float32)
    index.add(Node(id=500, embedding=v))
    results = index.search(v, n_probe=4, top_k=1)
    assert results[0][0].id == 500
    assert index.get_cluster_stats()["total_vectors"] == 101


def test_delete(built):
    index, nodes = built
    index.delete(13)
    assert index.storage.get(13) is None
    results = index.search(nodes[13].embedding, n_probe=4, top_k=5)
    assert all(n.id != 13 for n, _ in results)
    assert index.get_cluster_stats()["total_vectors"] == 99


def test_cluster_stats(built):
    index, _ = built
    stats = index.get_cluster_stats()
    assert stats["total_vectors"] == 100
    assert stats["min_size"] >= 0
    assert stats["max_size"] <= 100
    assert stats["min_size"] <= stats["avg_size"] <= stats["max_size"]
    with pytest.raises(ValueError):
        index.get_cluster_size(4)
    assert sum(index.get_cluster_size(c) for c in range(4)) == 100


def test_persistence_roundtrip(tmp_path, rng):
    storage = InMemoryNodeStorage()
    path = tmp_path / "ivf.npz"
    nodes = make_nodes(rng, 60, 8)
    index = IvfIndex(k=3, storage=storage, index_file=path)
    index.build_index(nodes)
    q = rng.standard_normal(8).astype(np.float32)
    before = [n.id for n, _ in index.search(q, n_probe=3, top_k=5)]

    index2 = IvfIndex(k=3, storage=storage, index_file=path)
    assert index2.centroids is not None
    after = [n.id for n, _ in index2.search(q, n_probe=3, top_k=5)]
    assert before == after


def test_search_batch(built, rng):
    index, nodes = built
    q = rng.standard_normal((6, 16)).astype(np.float32)
    dists, ids = index.search_batch(q, n_probe=4, top_k=3)
    assert dists.shape == (6, 3)
    assert np.all(ids >= 0)
    assert np.all(np.diff(dists, axis=1) >= -1e-6)


def test_ivf_rp_filter_ids(rng):
    """RP-mode filtered search: subset contract + brute-force parity at
    full probe (rp projection lossless at dims=dim)."""
    n, dim = 400, 24
    x = rng.standard_normal((n, dim)).astype(np.float32)
    index = IvfIndex(k=8)
    index.build_index([Node(id=i, embedding=x[i]) for i in range(n)])
    index.enable_rp(dims=dim)

    allowed = set(int(i) for i in rng.choice(n, 120, replace=False))
    q = rng.standard_normal((5, dim)).astype(np.float32)
    for n_probe in (4, 8):  # probe path and full-scan path
        _, ids = index.search_batch(q, n_probe=n_probe, top_k=5, rp=True,
                                    filter_ids=allowed, fetch=128)
        for i in range(5):
            got = [int(v) for v in ids[i] if v >= 0]
            assert all(g in allowed for g in got), (n_probe, got)
    al = np.asarray(sorted(allowed))
    d = ((q[:, None] - x[al][None]) ** 2).sum(-1)
    want = al[np.argsort(d, 1)[:, :5]]
    _, ids = index.search_batch(q, n_probe=8, top_k=5, rp=True,
                                filter_ids=allowed, fetch=128)
    for i in range(5):
        assert set(int(v) for v in ids[i] if v >= 0) == set(
            want[i].tolist())
