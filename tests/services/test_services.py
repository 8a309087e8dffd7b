"""Service-layer tests mirroring the reference's
(tests/services/test_{indexing,storage,embedding}_service.py): config-driven
construction, load-vs-create index, _index_modified flag, flush-threshold
save semantics, storage CRUD + cross-instance persistence, metadata filter.
"""

import numpy as np
import pytest
import yaml

from vector_db_tpu.services.embedding_service import EmbeddingService
from vector_db_tpu.services.indexing_service import IndexingService
from vector_db_tpu.services.storage_service import StorageService
from vector_db_tpu.types import Node


@pytest.fixture
def config_path(tmp_path):
    cfg = {
        "embedding": {"model": "fake-16", "dimension": 16},
        "device": "cpu",
        "index": {"ef_construction": 40, "M": 4, "flush_threshold": 5},
        "vector_db": {
            "file_path": str(tmp_path / "vdb"),
            "dimension": 16,
            "capacity": 64,
        },
    }
    p = tmp_path / "config.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


@pytest.fixture
def storage_service(tmp_path):
    return StorageService(file_path=str(tmp_path / "vdb"), dim=16, capacity=64)


def make_node(i, rng):
    return Node(
        id=i, embedding=rng.standard_normal(16).astype(np.float32),
        metadata={"cat": "a" if i % 2 == 0 else "b"}, content=f"doc{i}",
    )


# ---- StorageService ----

def test_storage_service_validation(tmp_path):
    with pytest.raises(ValueError):
        StorageService(str(tmp_path / "x"), dim=0, capacity=10)
    with pytest.raises(ValueError):
        StorageService(str(tmp_path / "x"), dim=4, capacity=0)


def test_storage_service_crud(storage_service, rng):
    n = make_node(0, rng)
    storage_service.save(n)
    assert storage_service.size() == 1
    assert storage_service.get(0).content == "doc0"
    np.testing.assert_allclose(storage_service.get_embedding(0), n.embedding)
    storage_service.delete(0)
    assert storage_service.get(0) is None


def test_storage_service_file_naming(tmp_path, storage_service):
    assert (tmp_path / "vdb.embeddings.npy").exists()
    assert (tmp_path / "vdb.metadata.npy").exists()


def test_filter_by_metadata(storage_service, rng):
    for i in range(6):
        storage_service.save(make_node(i, rng))
    evens = storage_service.filter_by_metadata({"cat": "a"})
    assert evens == {0, 2, 4}
    assert storage_service.filter_by_metadata({"cat": "z"}) == set()
    assert storage_service.filter_by_metadata({}) == {0, 1, 2, 3, 4, 5}


def test_storage_cross_instance_persistence(tmp_path, rng):
    s1 = StorageService(str(tmp_path / "p"), dim=16, capacity=32)
    s1.save(make_node(7, rng))
    s1.close()
    s2 = StorageService(str(tmp_path / "p"), dim=16, capacity=32)
    assert s2.size() == 1
    assert s2.get(7).content == "doc7"


# ---- IndexingService ----

def test_indexing_service_create_and_flags(storage_service, config_path, rng):
    svc = IndexingService(
        storage=storage_service.storage, config_path=config_path
    )
    assert not svc.is_index_loaded()
    assert not svc._index_modified
    assert svc.index.M == 4
    assert svc.index.ef_construction == 40
    assert svc.flush_threshold == 5
    svc.insert_node(make_node(0, rng))
    # below threshold: modified flag stays set, no save yet
    assert svc._index_modified
    assert not svc.index_file.exists()


def test_indexing_service_threshold_flush(storage_service, config_path, rng):
    svc = IndexingService(
        storage=storage_service.storage, config_path=config_path
    )
    for i in range(5):
        svc.insert_node(make_node(i, rng))
    # 5th insert hits flush_threshold=5 -> auto save
    assert svc.index_file.exists()
    assert not svc._index_modified


def test_indexing_service_load_existing(storage_service, config_path, rng):
    svc = IndexingService(
        storage=storage_service.storage, config_path=config_path
    )
    for i in range(6):
        svc.insert_node(make_node(i, rng))
    svc.save_index()

    svc2 = IndexingService(
        storage=storage_service.storage, config_path=config_path
    )
    assert svc2.is_index_loaded()
    assert svc2.get_index_size() == 6
    q = storage_service.get_embedding(3)
    results = svc2.search(np.asarray(q), k=1)
    assert results[0][0].id == 3


def test_indexing_service_save_semantics(storage_service, config_path, rng):
    svc = IndexingService(
        storage=storage_service.storage, config_path=config_path
    )
    svc.insert_node(make_node(0, rng))
    svc.save_index()
    assert not svc._index_modified
    mtime = svc.index_file.stat().st_mtime_ns
    svc.save_index()  # unmodified -> no rewrite
    assert svc.index_file.stat().st_mtime_ns == mtime
    svc.force_save_index()  # force -> rewrite
    assert svc.index_file.stat().st_mtime_ns >= mtime


def test_indexing_service_batch_insert(storage_service, config_path, rng):
    svc = IndexingService(
        storage=storage_service.storage, config_path=config_path
    )
    svc.insert_nodes([make_node(i, rng) for i in range(10)])
    assert svc.get_index_size() == 10
    # threshold 5 crossed; batched flushes complete in the background
    svc.wait_for_flush()
    assert svc.index_file.exists()


# ---- EmbeddingService ----

def test_embedding_service_fake_backend(config_path):
    svc = EmbeddingService(config_path)
    v = svc.embed_text("hello world")
    assert v.shape == (16,)
    # deterministic
    np.testing.assert_array_equal(v, svc.embed_text("hello world"))
    assert not np.allclose(v, svc.embed_text("other text"))
    m = svc.embed_texts(["a", "b", "c"])
    assert m.shape == (3, 16)
    np.testing.assert_array_equal(m[0], svc.embed_text("a"))


def test_embedding_service_dim_validation(tmp_path):
    cfg = {"embedding": {"model": "fake-8", "dimension": 8}}
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg))
    svc = EmbeddingService(str(p))
    assert svc.embed_text("x").shape == (8,)


def test_indexing_service_bulk_initial_load(storage_service, config_path, rng):
    svc = IndexingService(
        storage=storage_service.storage, config_path=config_path
    )
    # large batch into an empty hnsw index takes the bulk_build path
    import numpy as np
    from vector_db_tpu.types import Node

    n = 4096
    # storage capacity in fixture is 64 — use a separate bigger storage
    from vector_db_tpu.services.storage_service import StorageService

    big = StorageService(str(svc.index_file.parent / "big"), dim=16,
                         capacity=8192)
    svc2 = IndexingService(storage=big.storage, config_path=config_path,
                           index_file=str(svc.index_file.parent / "big.idx.npz"))
    nodes = [Node(id=i, embedding=rng.standard_normal(16).astype(np.float32))
             for i in range(n)]
    svc2.insert_nodes(nodes)
    assert svc2.get_index_size() == n
    assert big.get(7) is not None  # payloads stored
    res = svc2.search(nodes[7].embedding, k=1, ef=30)
    assert res[0][0].id == 7


def test_batched_insert_async_flush(storage_service, config_path, rng):
    """Batched inserts past the threshold flush through the background
    writer (latest-wins snapshot); wait_for_flush() is the completion
    barrier and the written checkpoint loads cleanly."""
    svc = IndexingService(
        storage=storage_service.storage, config_path=config_path
    )
    assert svc._flush_async
    svc.insert_nodes([make_node(i, rng) for i in range(8)])
    svc.wait_for_flush()
    assert svc.index_file.exists()
    assert not svc._index_modified
    # no stale temp file left behind by the atomic rename
    leftovers = list(svc.index_file.parent.glob("*.tmp.npz"))
    assert leftovers == []

    svc2 = IndexingService(
        storage=storage_service.storage, config_path=config_path
    )
    assert svc2.is_index_loaded()
    assert svc2.get_index_size() == 8
    q = storage_service.get_embedding(3)
    results = svc2.search(np.asarray(q), k=1)
    assert results[0][0].id == 3


def test_single_insert_flush_stays_synchronous(
        storage_service, config_path, rng):
    """Reference parity (indexing_service.py:137-144): the checkpoint file
    exists as soon as the threshold-crossing single-node insert returns —
    no flush barrier needed on the reference's own surface."""
    svc = IndexingService(
        storage=storage_service.storage, config_path=config_path
    )
    for i in range(5):
        svc.insert_node(make_node(i, rng))
    assert svc.index_file.exists()
