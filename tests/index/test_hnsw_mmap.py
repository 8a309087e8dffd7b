"""HNSW over mmap-backed storage with full reload — mirrors the
reference's mmap-backed index reload test (tests/indexing/test_hnsw.py:258-307):
graph file + storage files survive process turnover together, and the
reloaded index serves identical results with embeddings rehydrated from
the memmap."""

import random

import numpy as np

from vector_db_tpu.index.hnsw import HNSW
from vector_db_tpu.storage import MMapNodeStorage
from vector_db_tpu.types import Node


def test_hnsw_mmap_backed_reload(tmp_path, rng):
    kwargs = dict(
        embedding_file=tmp_path / "e.npy",
        metadata_file=tmp_path / "m.npy",
        dim=16, capacity=128,
    )
    storage = MMapNodeStorage(**kwargs)
    index = HNSW(M=8, ef_construction=40, rng=random.Random(42),
                 storage=storage, index_file=tmp_path / "g.npz")
    nodes = [
        Node(id=i, embedding=rng.standard_normal(16).astype(np.float32),
             metadata={"i": i}, content=f"doc-{i}")
        for i in range(60)
    ]
    index.build_index(nodes)
    index.delete_node(17)
    index.save_index()
    q = rng.standard_normal(16).astype(np.float32)
    before = [(n.id, round(d, 4)) for n, d in index.search(q, k=5, ef=40)]
    storage.close()

    # "new process": fresh storage + fresh index over the same files
    storage2 = MMapNodeStorage(**kwargs)
    index2 = HNSW(M=8, ef_construction=40, rng=random.Random(0),
                  storage=storage2, index_file=tmp_path / "g.npz")
    assert index2.size == 59
    after = [(n.id, round(d, 4)) for n, d in index2.search(q, k=5, ef=40)]
    assert before == after
    # payloads came back through the memmap
    node = index2.search(nodes[3].embedding, k=1, ef=40)[0][0]
    assert node.id == 3 and node.content == "doc-3"
    assert node.metadata == {"i": 3}
    # deleted node stays gone
    assert all(n.id != 17 for n, _ in index2.search(
        nodes[17].embedding, k=10, ef=40))
    # and the reloaded index accepts new inserts
    index2.insert_node(Node(id=100,
                            embedding=rng.standard_normal(16).astype(np.float32)))
    assert index2.size == 60
