"""Native metadata index: equivalence with the reference's scan semantics,
native vs pure-Python parity."""

import numpy as np
import pytest

from vector_db_tpu.native.metadata import MetadataIndex
from vector_db_tpu.services.storage_service import StorageService
from vector_db_tpu.types import Node


def populate(idx):
    idx.set(0, {"cat": "a", "n": 1})
    idx.set(1, {"cat": "b", "n": 1})
    idx.set(2, {"cat": "a", "n": 2})
    idx.set(3, {})
    idx.set(4, {"cat": "a", "n": 1, "extra": [1, 2]})


@pytest.mark.parametrize("force_python", [True, False])
def test_metadata_index_queries(force_python):
    idx = MetadataIndex(force_python=force_python)
    populate(idx)
    assert idx.size() == 5
    assert idx.query({"cat": "a"}) == {0, 2, 4}
    assert idx.query({"cat": "a", "n": 1}) == {0, 4}
    assert idx.query({"n": 1}) == {0, 1, 4}
    assert idx.query({"cat": "z"}) == set()
    assert idx.query({"extra": [1, 2]}) == {4}
    assert idx.query({}) == {0, 1, 2, 3, 4}

    idx.remove(0)
    assert idx.query({"cat": "a", "n": 1}) == {4}
    idx.set(2, {"cat": "b"})  # re-set replaces old tokens
    assert idx.query({"cat": "a"}) == {4}
    assert idx.query({"cat": "b"}) == {1, 2}


def test_native_backend_available():
    idx = MetadataIndex()
    assert idx.native, "g++ toolchain present but native index not built"


def test_native_matches_python_fuzz(rng):
    nat = MetadataIndex(force_python=False)
    py = MetadataIndex(force_python=True)
    keys = ["a", "b", "c"]
    vals = [1, 2, "x", None, True]
    for i in range(300):
        md = {k: vals[rng.integers(len(vals))]
              for k in keys if rng.random() < 0.6}
        nat.set(i, md)
        py.set(i, md)
    for i in range(0, 300, 7):
        nat.remove(i)
        py.remove(i)
    for k in keys:
        for v in vals:
            assert nat.query({k: v}) == py.query({k: v})
    assert nat.query({"a": 1, "b": 2}) == py.query({"a": 1, "b": 2})
    assert nat.query({}) == py.query({})


def test_storage_service_indexed_filter_matches_scan(tmp_path, rng):
    svc = StorageService(str(tmp_path / "vdb"), dim=8, capacity=128)
    for i in range(60):
        svc.save(Node(
            id=i, embedding=rng.standard_normal(8).astype(np.float32),
            metadata={"par": i % 3, "flag": bool(i % 2)},
        ))
    svc.delete(10)
    svc.save(Node(id=11, embedding=np.zeros(8, np.float32),
                  metadata={"par": 99}))  # overwrite changes metadata
    for f in [{"par": 0}, {"par": 1, "flag": True}, {"par": 99}, {},
              {"missing": 1}]:
        assert svc.filter_by_metadata(f) == svc.filter_by_metadata_scan(f), f


def test_storage_service_filter_survives_reopen(tmp_path, rng):
    svc = StorageService(str(tmp_path / "p"), dim=8, capacity=64)
    for i in range(10):
        svc.save(Node(id=i, embedding=rng.standard_normal(8).astype(np.float32),
                      metadata={"g": i % 2}))
    svc.close()
    svc2 = StorageService(str(tmp_path / "p"), dim=8, capacity=64)
    assert svc2.filter_by_metadata({"g": 0}) == {0, 2, 4, 6, 8}
