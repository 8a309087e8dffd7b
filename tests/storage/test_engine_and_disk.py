"""MemoryMappingService engine tests (mirrors reference
tests/inference/test_mmap_vector_store.py) and legacy DiskNodeStorage."""

import numpy as np
import pytest
import yaml

from vector_db_tpu.engine import MemoryMappingService
from vector_db_tpu.storage.disk import DiskNodeStorage


@pytest.fixture
def config_path(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(yaml.safe_dump(
        {"index": {"M": 4, "ef_construction": 30, "flush_threshold": 1000}}
    ))
    return str(p)


@pytest.fixture
def svc(tmp_path, config_path):
    return MemoryMappingService(
        file_path=str(tmp_path / "store"), dim=8, capacity=64,
        config_path=config_path,
    )


def test_validation(tmp_path, config_path):
    with pytest.raises(ValueError):
        MemoryMappingService(str(tmp_path / "x"), dim=0, capacity=4,
                             config_path=config_path)
    with pytest.raises(ValueError):
        MemoryMappingService(str(tmp_path / "x"), dim=4, capacity=0,
                             config_path=config_path)
    with pytest.raises(ValueError):
        MemoryMappingService(str(tmp_path / "x"), dim=4, capacity=4)


def test_write_read_search(svc, rng):
    vecs = rng.standard_normal((10, 8)).astype(np.float32)
    ids = [svc.write(v, content=f"doc{i}", metadata={"i": i})
           for i, v in enumerate(vecs)]
    assert svc.size == 10
    node = svc.read(ids[3])
    assert node.content == "doc3"
    np.testing.assert_allclose(node.embedding, vecs[3], rtol=1e-5)

    results = svc.search(vecs[3], k=1, ef=30)
    assert results[0][0].id == ids[3]
    assert results[0][1] < 1e-3


def test_write_validation(svc):
    with pytest.raises(TypeError):
        svc.write([1.0] * 8)
    with pytest.raises(ValueError):
        svc.write(np.zeros((2, 8), np.float32))
    with pytest.raises(ValueError):
        svc.write(np.zeros(4, np.float32))


def test_read_errors(svc):
    with pytest.raises(TypeError):
        svc.read("abc")
    with pytest.raises(IndexError):
        svc.read(999)


def test_delete(svc, rng):
    v = rng.standard_normal(8).astype(np.float32)
    nid = svc.write(v)
    svc.delete(nid)
    assert svc.size == 0
    with pytest.raises(IndexError):
        svc.read(nid)


def test_reopen_persistence(tmp_path, config_path, rng):
    # Reference contract (test_mmap_vector_store.py:351-385): a fresh
    # process over the same files sees the same data + index.
    vecs = rng.standard_normal((6, 8)).astype(np.float32)
    svc = MemoryMappingService(str(tmp_path / "p"), dim=8, capacity=32,
                               config_path=config_path)
    ids = [svc.write(v, content=f"c{i}") for i, v in enumerate(vecs)]
    svc.index.save_index()
    svc.storage.close()

    svc2 = MemoryMappingService(str(tmp_path / "p"), dim=8, capacity=32,
                                config_path=config_path)
    assert svc2.size == 6
    results = svc2.search(vecs[2], k=1, ef=30)
    assert results[0][0].id == ids[2]


def test_disk_storage_crud(tmp_path, rng):
    s = DiskNodeStorage(tmp_path / "db.sqlite", tmp_path / "emb.npy",
                        dim=8, capacity=16)
    from vector_db_tpu.types import Node

    v = rng.standard_normal(8).astype(np.float32)
    s.save(Node(id=5, embedding=v, metadata={"a": 1}, content="hello"))
    got = s.get(5)
    assert got.content == "hello"
    assert got.metadata == {"a": 1}
    np.testing.assert_allclose(got.embedding, v, rtol=1e-6)
    np.testing.assert_allclose(s.get_embedding(5), v, rtol=1e-6)
    assert s.size() == 1
    assert s.get_next_id() == 6
    s.delete(5)
    assert s.get(5) is None
    s.close()


def test_disk_storage_reopen(tmp_path, rng):
    from vector_db_tpu.types import Node

    v = rng.standard_normal(4).astype(np.float32)
    s = DiskNodeStorage(tmp_path / "db.sqlite", tmp_path / "e.npy",
                        dim=4, capacity=8)
    s.save(Node(id=0, embedding=v, content="x"))
    s.close()
    s2 = DiskNodeStorage(tmp_path / "db.sqlite", tmp_path / "e.npy",
                         dim=4, capacity=8)
    assert s2.size() == 1
    np.testing.assert_allclose(s2.get(0).embedding, v, rtol=1e-6)
    s2.close()
