"""MMap storage tests mirroring the reference's
(tests/inference/test_mmap_vector_store.py): CRUD, persistence across
reopen, capacity limits, truncation."""

import numpy as np
import pytest

from vector_db_tpu.storage import InMemoryNodeStorage, MMapNodeStorage
from vector_db_tpu.types import Node


@pytest.fixture
def store(tmp_path):
    return MMapNodeStorage(
        embedding_file=tmp_path / "e.npy",
        metadata_file=tmp_path / "m.npy",
        dim=8,
        capacity=16,
    )


def make_node(i, rng, dim=8, **kw):
    return Node(id=i, embedding=rng.standard_normal(dim).astype(np.float32), **kw)


def test_save_get_roundtrip(store, rng):
    n = make_node(3, rng, metadata={"a": 1}, content="hello")
    store.save(n)
    got = store.get(3)
    assert got.id == 3
    assert got.content == "hello"
    assert got.metadata == {"a": 1}
    np.testing.assert_allclose(got.embedding, n.embedding)


def test_get_missing_returns_none(store):
    assert store.get(99) is None
    with pytest.raises(KeyError):
        store.get_embedding(99)


def test_size_and_ids(store, rng):
    for i in range(5):
        store.save(make_node(i, rng))
    assert store.size() == 5
    assert sorted(store.get_all_ids()) == [0, 1, 2, 3, 4]


def test_delete(store, rng):
    store.save(make_node(0, rng))
    store.save(make_node(1, rng))
    store.delete(0)
    assert store.get(0) is None
    assert store.size() == 1
    # node id 0 delete must not break other nodes (reference latent bug:
    # deleted slots marked id=0 collide with real id 0, storage.py:286-306)
    assert store.get(1) is not None


def test_overwrite_same_id(store, rng):
    store.save(make_node(5, rng, content="v1"))
    store.save(make_node(5, rng, content="v2"))
    assert store.size() == 1
    assert store.get(5).content == "v2"


def test_capacity_limit(tmp_path, rng):
    store = MMapNodeStorage(
        embedding_file=tmp_path / "e.npy",
        metadata_file=tmp_path / "m.npy",
        dim=4, capacity=3,
    )
    for i in range(3):
        store.save(make_node(i, rng, dim=4))
    with pytest.raises(RuntimeError, match="full"):
        store.save(make_node(3, rng, dim=4))


def test_dim_mismatch_raises(store, rng):
    with pytest.raises(ValueError):
        store.save(make_node(0, rng, dim=4))


def test_reopen_persistence(tmp_path, rng):
    # Reference contract: reopen rebuilds id->row from the file
    # (tests/inference/test_mmap_vector_store.py:351-385).
    kwargs = dict(
        embedding_file=tmp_path / "e.npy",
        metadata_file=tmp_path / "m.npy",
        dim=8, capacity=16,
    )
    store = MMapNodeStorage(**kwargs)
    nodes = [make_node(i, rng, metadata={"i": i}, content=f"doc{i}")
             for i in range(6)]
    for n in nodes:
        store.save(n)
    store.delete(2)
    store.close()

    store2 = MMapNodeStorage(**kwargs)
    assert store2.size() == 5
    assert store2.get(2) is None
    got = store2.get(4)
    assert got.content == "doc4"
    assert got.metadata == {"i": 4}
    np.testing.assert_allclose(got.embedding, nodes[4].embedding)
    # next id continues past the highest stored id
    assert store2.get_next_id() >= 6


def test_content_truncation(tmp_path, rng):
    store = MMapNodeStorage(
        embedding_file=tmp_path / "e.npy",
        metadata_file=tmp_path / "m.npy",
        dim=4, capacity=4, content_chars=8, metadata_chars=64,
    )
    store.save(make_node(0, rng, dim=4, content="x" * 100))
    assert store.get(0).content == "x" * 8


def test_get_next_id_monotonic(store, rng):
    a = store.get_next_id()
    b = store.get_next_id()
    assert b == a + 1
    store.save(make_node(100, rng))
    assert store.get_next_id() == 101


def test_in_memory_storage_contract(rng):
    s = InMemoryNodeStorage()
    s.save(make_node(0, rng))
    s.add(make_node(1, rng))
    assert s.size() == 2
    assert s.get_next_id() == 2
    s.delete(0)
    assert s.get(0) is None
    with pytest.raises(KeyError):
        s.get_embedding(0)


def test_get_embeddings_bulk(tmp_path, rng):
    from vector_db_tpu.storage.mmap import MMapNodeStorage
    from vector_db_tpu.types import Node

    s = MMapNodeStorage(
        embedding_file=tmp_path / "e.npy", metadata_file=tmp_path / "m.npy",
        dim=8, capacity=64,
    )
    x = rng.standard_normal((20, 8)).astype(np.float32)
    for i in range(20):
        s.save(Node(id=i * 3, embedding=x[i], metadata={"i": i},
                    content=f"c{i}"))
    s.delete(9)  # id 9 = row for i=3

    ids = [0, 3, 9, 57, 999]  # present, present, deleted, present, never
    rows, found = s.get_embeddings(ids)
    np.testing.assert_array_equal(found, [True, True, False, True, False])
    np.testing.assert_allclose(rows[0], x[0], rtol=1e-6)
    np.testing.assert_allclose(rows[1], x[1], rtol=1e-6)
    np.testing.assert_allclose(rows[3], x[19], rtol=1e-6)
    assert np.all(rows[2] == 0) and np.all(rows[4] == 0)

    # matches the base-class per-id fallback exactly
    from vector_db_tpu.storage.base import NodeStorage

    base_rows, base_found = NodeStorage.get_embeddings(s, ids)
    np.testing.assert_array_equal(found, base_found)
    np.testing.assert_allclose(rows, base_rows, rtol=1e-6)


def test_iter_metadata_bulk(tmp_path, rng):
    from vector_db_tpu.storage.mmap import MMapNodeStorage
    from vector_db_tpu.types import Node

    s = MMapNodeStorage(
        embedding_file=tmp_path / "e.npy", metadata_file=tmp_path / "m.npy",
        dim=4, capacity=32,
    )
    for i in range(6):
        s.save(Node(id=i, embedding=np.ones(4, np.float32) * i,
                    metadata={"topic": str(i % 2)}, content=f"doc {i}"))
    s.delete(2)
    got = {nid: (meta, content) for nid, meta, content in s.iter_metadata()}
    assert set(got) == {0, 1, 3, 4, 5}
    assert got[3] == ({"topic": "1"}, "doc 3")
