"""Crash-consistent streaming inserts (two-phase commit repair).

``HNSW.insert_nodes`` is two-phase: storage ``save_many`` first
(reference hnsw.py:150 writes storage before linking), then the graph
edge commit. A process kill between the phases leaves rows durable in
storage but absent from the graph; before the repair, a resume rescan
made those rows LOOK live (storage finds them) while no traversal could
ever reach them — silent data loss. ``HNSW.recover_unlinked`` (called on
``load_index``) must re-link them, with no ghost rows and no duplicate
slots. Reference resilience analog: skip-dangling (hnsw.py:117-121)
covers the opposite tear (storage row deleted behind the graph's back).
"""

import random

import numpy as np

from vector_db_tpu.index.hnsw import HNSW
from vector_db_tpu.storage import MMapNodeStorage
from vector_db_tpu.types import Node


def _mk(tmp_path, dim=16, capacity=256):
    return dict(
        embedding_file=tmp_path / "e.npy",
        metadata_file=tmp_path / "m.npy",
        dim=dim, capacity=capacity,
    )


def _nodes(rng, ids, dim=16):
    return [
        Node(id=i, embedding=rng.standard_normal(dim).astype(np.float32),
             metadata={"i": i}, content=f"doc-{i}")
        for i in ids
    ]


def test_kill_between_storage_and_graph_commit(tmp_path, rng):
    kwargs = _mk(tmp_path)
    storage = MMapNodeStorage(**kwargs)
    index = HNSW(M=8, ef_construction=40, rng=random.Random(42),
                 storage=storage, index_file=tmp_path / "g.npz")
    base = _nodes(rng, range(40))
    index.build_index(base)
    index.save_index()

    # simulate the torn batch: phase A (storage write) completed, the
    # process dies before phase B (graph commit) — exactly what a kill
    # inside insert_nodes between save_many and _insert_rows produces
    torn = _nodes(rng, range(40, 48))
    storage.save_many(torn)
    storage.close()

    # "new process": resume over the same files
    storage2 = MMapNodeStorage(**kwargs)
    index2 = HNSW(M=8, ef_construction=40, rng=random.Random(0),
                  storage=storage2, index_file=tmp_path / "g.npz")

    # no unlinked live rows: every storage row is reachable by search
    assert index2.size == 48
    for n in torn:
        hits = index2.search(np.asarray(n.embedding), k=1, ef=64)
        assert hits and hits[0][0].id == n.id
        assert hits[0][1] < 0.05  # self-query: ~0 up to f32 dot noise

    # no ghost rows: ids appear exactly once across a full-corpus query
    _, ids = index2.search_batch(
        np.stack([np.asarray(n.embedding) for n in torn]), 48, ef=96)
    for row in np.asarray(ids):
        live = row[row >= 0]
        assert len(set(live.tolist())) == len(live)


def test_recover_is_idempotent_and_clean_resume_noop(tmp_path, rng):
    kwargs = _mk(tmp_path)
    storage = MMapNodeStorage(**kwargs)
    index = HNSW(M=8, ef_construction=40, rng=random.Random(42),
                 storage=storage, index_file=tmp_path / "g.npz")
    index.build_index(_nodes(rng, range(30)))
    index.save_index()
    storage.close()

    storage2 = MMapNodeStorage(**kwargs)
    index2 = HNSW(M=8, ef_construction=40, rng=random.Random(0),
                  storage=storage2, index_file=tmp_path / "g.npz")
    # clean shutdown: nothing to repair, and re-running repairs nothing
    assert index2.recover_unlinked() == 0
    assert index2.size == 30


def test_recover_skips_deleted_rows(tmp_path, rng):
    """A node deleted through the index is gone from BOTH layers; resume
    repair must not resurrect anything after a clean delete."""
    kwargs = _mk(tmp_path)
    storage = MMapNodeStorage(**kwargs)
    index = HNSW(M=8, ef_construction=40, rng=random.Random(42),
                 storage=storage, index_file=tmp_path / "g.npz")
    nodes = _nodes(rng, range(30))
    index.build_index(nodes)
    index.delete_node(7)
    index.save_index()
    storage.close()

    storage2 = MMapNodeStorage(**kwargs)
    index2 = HNSW(M=8, ef_construction=40, rng=random.Random(0),
                  storage=storage2, index_file=tmp_path / "g.npz")
    assert index2.size == 29
    assert all(n.id != 7 for n, _ in index2.search(
        np.asarray(nodes[7].embedding), k=10, ef=64))
