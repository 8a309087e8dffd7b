"""Core types / config / util coverage."""

import os

import numpy as np
import pytest
import yaml

from vector_db_tpu.config import Config, load_config
from vector_db_tpu.types import Node
from vector_db_tpu.util.distance import euclidean_vector_distance
from vector_db_tpu.util.math import top_k_indices_sorted


def test_node_normalizes_inputs():
    n = Node(id=1, embedding=[1.0, 2.0, 3.0], metadata=None)
    assert n.embedding.dtype == np.float32
    assert n.metadata == {}
    assert n.content is None


def test_euclidean_distance():
    assert euclidean_vector_distance([0, 0], [3, 4]) == pytest.approx(5.0)
    assert euclidean_vector_distance([1, 1], [1, 1]) == 0.0


def test_top_k_indices_sorted():
    v = np.array([1.0, 9.0, 3.0, 7.0])
    np.testing.assert_array_equal(top_k_indices_sorted(v, 2), [1, 3])
    np.testing.assert_array_equal(top_k_indices_sorted(v, 10), [1, 3, 2, 0])


def test_config_defaults():
    cfg = load_config("/nonexistent/path.yaml")
    assert cfg["index"]["M"] == 16
    assert cfg["index"]["ef_construction"] == 200
    assert cfg["index"]["flush_threshold"] == 1000
    assert cfg["vector_db"]["capacity"] == 1_000_000
    assert cfg["embedding"]["dimension"] == 384


def test_config_merge_and_dataclass(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump({"index": {"M": 4}}))
    cfg = Config.load(p)
    assert cfg.index.M == 4
    assert cfg.index.ef_construction == 200  # default preserved
    assert cfg.vector_db.dimension == 384


def test_config_env_var(tmp_path, monkeypatch):
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump({"vector_db": {"capacity": 7}}))
    monkeypatch.setenv("CONFIG_PATH", str(p))
    assert load_config()["vector_db"]["capacity"] == 7


def test_search_bucketing_equivalence(rng):
    """Bucketed shapes must return the same results as unbucketed."""
    import random

    from vector_db_tpu.index.hnsw import HNSW

    x = rng.standard_normal((120, 16)).astype(np.float32)
    index = HNSW(M=8, ef_construction=40, rng=random.Random(42), capacity=128)
    index.insert_arrays(list(range(120)), x, batch_size=120)
    q = rng.standard_normal((5, 16)).astype(np.float32)
    d1, i1 = index.search_batch(q, k=7, ef=50, bucket=True)
    d2, i2 = index.search_batch(q, k=7, ef=64, bucket=False)
    assert d1.shape == (5, 7)
    # bucketing rounds ef 50->64, so identical search width
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-5)
