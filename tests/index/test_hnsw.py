"""HNSW behavioral tests, mirroring the reference's strategy
(tests/indexing/test_hnsw.py): recall vs brute force, graph connectivity,
idempotent insert, delete with entry re-election, persistence round-trip.
"""

import random

import numpy as np
import pytest

from vector_db_tpu.index.hnsw import HNSW
from vector_db_tpu.storage import InMemoryNodeStorage
from vector_db_tpu.types import Node


def make_nodes(rng, n, dim):
    return [
        Node(id=i, embedding=rng.standard_normal(dim).astype(np.float32),
             metadata={"i": i})
        for i in range(n)
    ]


def brute_force_ids(nodes, q, k):
    d = np.array([np.linalg.norm(q - n.embedding) for n in nodes])
    return [nodes[i].id for i in np.argsort(d)[:k]]


@pytest.fixture
def small_index(rng):
    nodes = make_nodes(rng, 100, 16)
    index = HNSW(M=8, ef_construction=50, rng=random.Random(42))
    index.build_index(nodes)
    return index, nodes


def test_insert_and_size(rng):
    index = HNSW(M=4, ef_construction=20, rng=random.Random(42))
    nodes = make_nodes(rng, 20, 8)
    for n in nodes:
        index.insert_node(n)
    assert index.size == 20
    assert index.storage.size() == 20


def test_exact_match_self_query(small_index):
    index, nodes = small_index
    results = index.search(nodes[17].embedding, k=1, ef=50)
    assert results[0][0].id == 17
    assert results[0][1] < 1e-3


def test_recall_vs_brute_force(small_index, rng):
    # Reference contract: recall@5 >= 0.7 on >= 80% of 10 queries
    # (tests/indexing/test_hnsw.py:127-153).
    index, nodes = small_index
    ok = 0
    for _ in range(10):
        q = rng.standard_normal(16).astype(np.float32)
        got = {n.id for n, _ in index.search(q, k=5, ef=50)}
        want = set(brute_force_ids(nodes, q, 5))
        if len(got & want) / 5 >= 0.7:
            ok += 1
    assert ok >= 8


def test_batched_recall_matches_sequential(rng):
    # Bulk insert must reach the same recall bar as one-by-one insert.
    nodes = make_nodes(rng, 100, 16)
    index = HNSW(M=8, ef_construction=50, rng=random.Random(42))
    index.insert_nodes(nodes, batch_size=100)  # one whole-corpus batch
    ok = 0
    for _ in range(10):
        q = rng.standard_normal(16).astype(np.float32)
        got = {n.id for n, _ in index.search(q, k=5, ef=50)}
        want = set(brute_force_ids(nodes, q, 5))
        if len(got & want) / 5 >= 0.7:
            ok += 1
    assert ok >= 8


def test_level0_connectivity(small_index):
    # Reference contract: BFS from entry at level 0 reaches >= 90% of nodes
    # (tests/indexing/test_hnsw.py:155-185).
    index, nodes = small_index
    entry = index.entry_node_id
    seen = {entry}
    frontier = [entry]
    while frontier:
        nxt = []
        for nid in frontier:
            for nb in index.neighbors_of(nid, 0):
                if nb not in seen:
                    seen.add(nb)
                    nxt.append(nb)
        frontier = nxt
    assert len(seen) >= 0.9 * len(nodes)


def test_idempotent_insert(rng):
    # Reference contract (tests/indexing/test_hnsw.py:309-327).
    index = HNSW(M=4, ef_construction=20, rng=random.Random(42))
    nodes = make_nodes(rng, 20, 8)
    index.build_index(nodes)
    index.insert_node(nodes[5])
    index.insert_node(nodes[5])
    assert index.size == 20
    results = index.search(nodes[5].embedding, k=1)
    assert results[0][0].id == 5


def test_delete_node(rng):
    index = HNSW(M=4, ef_construction=30, rng=random.Random(42))
    nodes = make_nodes(rng, 30, 8)
    index.build_index(nodes)
    index.delete_node(7)
    assert index.size == 29
    assert index.storage.get(7) is None
    results = index.search(nodes[7].embedding, k=5, ef=30)
    assert all(n.id != 7 for n, _ in results)
    assert len(results) == 5


def test_delete_entry_point_reelects(rng):
    index = HNSW(M=4, ef_construction=30, rng=random.Random(42))
    nodes = make_nodes(rng, 30, 8)
    index.build_index(nodes)
    entry = index.entry_node_id
    index.delete_node(entry)
    assert index.entry_node_id != entry
    assert index.entry_node_id is not None
    # still searchable
    q = nodes[3].embedding
    results = index.search(q, k=3, ef=30)
    assert len(results) == 3


def test_delete_all_then_insert(rng):
    index = HNSW(M=4, ef_construction=20, rng=random.Random(42))
    nodes = make_nodes(rng, 5, 8)
    index.build_index(nodes)
    for n in nodes:
        index.delete_node(n.id)
    assert index.size == 0
    assert index.search(nodes[0].embedding, k=3) == []
    index.insert_node(Node(id=100, embedding=nodes[0].embedding))
    results = index.search(nodes[0].embedding, k=1)
    assert results[0][0].id == 100


def test_filter_ids(small_index, rng):
    # Reference semantics: non-matching nodes navigate but are excluded
    # from results (hnsw.py:81-88,96-97,127-131).
    index, nodes = small_index
    allowed = {1, 3, 5, 7, 9}
    q = rng.standard_normal(16).astype(np.float32)
    results = index.search(q, k=5, ef=50, filter_ids=allowed)
    assert len(results) > 0
    assert {n.id for n, _ in results} <= allowed


def test_filter_ids_empty_filter(small_index, rng):
    index, nodes = small_index
    q = rng.standard_normal(16).astype(np.float32)
    assert index.search(q, k=5, ef=50, filter_ids=set()) == []


def test_persistence_roundtrip(tmp_path, rng):
    # Reference contract (tests/indexing/test_hnsw.py:220-256): graph
    # persists, embeddings rehydrate from storage.
    storage = InMemoryNodeStorage()
    path = tmp_path / "hnsw.npz"
    nodes = make_nodes(rng, 50, 8)
    index = HNSW(M=4, ef_construction=30, rng=random.Random(42),
                 storage=storage, index_file=path)
    index.build_index(nodes)
    index.save_index()
    q = rng.standard_normal(8).astype(np.float32)
    before = [(n.id, round(d, 4)) for n, d in index.search(q, k=5, ef=30)]

    index2 = HNSW(M=4, ef_construction=30, rng=random.Random(7),
                  storage=storage, index_file=path)
    assert index2.size == 50
    after = [(n.id, round(d, 4)) for n, d in index2.search(q, k=5, ef=30)]
    assert before == after


def test_search_batch_shapes(small_index, rng):
    index, nodes = small_index
    q = rng.standard_normal((7, 16)).astype(np.float32)
    dists, ids = index.search_batch(q, k=4, ef=40)
    assert dists.shape == (7, 4)
    assert ids.shape == (7, 4)
    assert np.all(ids >= 0)
    # sorted ascending
    assert np.all(np.diff(dists, axis=1) >= -1e-6)


def test_empty_index_search():
    index = HNSW(M=4, ef_construction=20, rng=random.Random(42))
    assert index.search(np.zeros(8, np.float32), k=3) == []


def test_capacity_growth(rng):
    index = HNSW(M=4, ef_construction=20, rng=random.Random(42), capacity=8)
    nodes = make_nodes(rng, 40, 8)
    index.build_index(nodes)
    assert index.size == 40
    results = index.search(nodes[11].embedding, k=1, ef=30)
    assert results[0][0].id == 11


def test_storage_deleted_node_skipped(rng):
    # Reference tolerates nodes deleted from storage but still in the graph
    # (hnsw.py:117-121): they never appear in results.
    index = HNSW(M=4, ef_construction=30, rng=random.Random(42))
    nodes = make_nodes(rng, 30, 8)
    index.build_index(nodes)
    index.storage.delete(12)
    index.sync_storage()
    results = index.search(nodes[12].embedding, k=5, ef=30)
    assert all(n.id != 12 for n, _ in results)


def test_duplicate_ids_within_batch(rng):
    """A duplicate id inside ONE batch must not allocate two slots
    (diverges from the reference's idempotent insert otherwise: searches
    return the id twice and delete leaves a ghost row)."""
    index = HNSW(M=4, ef_construction=20, rng=random.Random(42))
    v = rng.standard_normal(8).astype(np.float32)
    dup = [Node(id=7, embedding=v, metadata={}),
           Node(id=7, embedding=v + 0.01, metadata={}),
           Node(id=8, embedding=rng.standard_normal(8).astype(np.float32))]
    index.insert_nodes(dup)
    assert index.size == 2
    live_slots = int(np.asarray(index._has_emb).sum())
    assert live_slots == 2
    ids = [n.id for n, _ in index.search(v, k=4, ef=20)]
    assert ids.count(7) == 1
    index.delete_node(7)
    assert index.size == 1
    ids = [n.id for n, _ in index.search(v, k=4, ef=20)]
    assert 7 not in ids


def test_duplicate_ids_insert_arrays(rng):
    index = HNSW(M=4, ef_construction=20, rng=random.Random(42))
    embs = rng.standard_normal((4, 8)).astype(np.float32)
    index.insert_arrays([3, 3, 4, 4], embs)
    assert index.size == 2
    assert int(np.asarray(index._has_emb).sum()) == 2


def test_duplicate_ids_bulk_build(rng):
    index = HNSW(M=4, ef_construction=20, rng=random.Random(42))
    embs = rng.standard_normal((5, 8)).astype(np.float32)
    index.bulk_build([0, 1, 1, 2, 2], embs)
    assert index.size == 3
    assert int(np.asarray(index._has_emb).sum()) == 3


def test_delete_clears_incoming_edges(rng):
    """After delete, NO row anywhere may still reference the freed slot:
    slots are recycled, so a stale incoming (asymmetric) edge would alias
    an unrelated new node (the reference's id-keyed graph never aliases)."""
    nodes = make_nodes(rng, 60, 8)
    index = HNSW(M=4, ef_construction=30, rng=random.Random(42))
    for n in nodes:
        index.insert_node(n)
    for victim in (13, 37, 5):
        slot = index._slot_of_id[victim]
        index.delete_node(victim)
        table = np.asarray(index.graph.neighbors)
        assert not (table == slot).any(), (
            f"stale edges to deleted slot {slot} remain"
        )


def test_search_batch_scan_modes(rng):
    """Scan modes over the HNSW table: exact == brute force, bf16 is
    recall-near-1 with exact reported distances; filters mask."""
    import random as _random

    from vector_db_tpu.index.hnsw import HNSW

    n, dim = 3000, 32
    x = rng.standard_normal((n, dim)).astype(np.float32)
    idx = HNSW(M=8, ef_construction=60, rng=_random.Random(42), capacity=n)
    idx.bulk_build(list(range(n)), x)
    q = rng.standard_normal((16, dim)).astype(np.float32)
    d = ((q[:, None] - x[None]) ** 2).sum(-1)
    gt = np.argsort(d, 1)[:, :10]

    de, ie = idx.search_batch_scan(q, k=10, mode="exact")
    assert np.mean([len(set(ie[i]) & set(gt[i])) / 10
                    for i in range(16)]) == 1.0
    db, ib = idx.search_batch_scan(q, k=10, mode="bf16")
    assert np.mean([len(set(ib[i]) & set(gt[i])) / 10
                    for i in range(16)]) >= 0.95
    # bf16 selection, exact reported distances
    for i in range(4):
        sel = ib[i][ib[i] >= 0]
        dref = np.sqrt(((q[i] - x[sel]) ** 2).sum(-1))
        np.testing.assert_allclose(db[i][: len(sel)], dref, rtol=1e-4)
    # blocksel: two-phase block-min select + exact block rerank
    dbs, ibs = idx.search_batch_scan(q, k=10, mode="blocksel")
    assert np.mean([len(set(ibs[i]) & set(gt[i])) / 10
                    for i in range(16)]) >= 0.95
    # filters mask candidates
    allowed = set(range(0, n, 3))
    _, fi = idx.search_batch_scan(q, k=10, mode="exact",
                                  filter_ids=allowed)
    assert all(int(v) % 3 == 0 for row in fi for v in row if v >= 0)
