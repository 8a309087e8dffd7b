"""Dataset loaders (fvecs/ivecs/bvecs round-trip) + synthetic generators."""

import numpy as np

from vector_db_tpu.datasets import (
    embedding_like,
    load_sift1m,
    read_bvecs,
    read_fvecs,
    read_ivecs,
    sift_like,
)


def _write_fvecs(path, mat):
    n, d = mat.shape
    out = np.empty((n, d + 1), np.int32)
    out[:, 0] = d
    out[:, 1:] = mat.astype(np.float32).view(np.int32)
    out.tofile(path)


def test_fvecs_roundtrip(tmp_path, rng):
    mat = rng.standard_normal((10, 8)).astype(np.float32)
    p = tmp_path / "x.fvecs"
    _write_fvecs(p, mat)
    got = read_fvecs(p)
    np.testing.assert_array_equal(got, mat)
    assert read_fvecs(p, count=3).shape == (3, 8)


def test_ivecs_roundtrip(tmp_path, rng):
    mat = rng.integers(0, 100, size=(5, 10)).astype(np.int32)
    out = np.empty((5, 11), np.int32)
    out[:, 0] = 10
    out[:, 1:] = mat
    p = tmp_path / "gt.ivecs"
    out.tofile(p)
    np.testing.assert_array_equal(read_ivecs(p), mat)


def test_bvecs_roundtrip(tmp_path, rng):
    mat = rng.integers(0, 255, size=(6, 16)).astype(np.uint8)
    recs = []
    for row in mat:
        recs.append(np.array([16], np.int32).tobytes() + row.tobytes())
    p = tmp_path / "x.bvecs"
    p.write_bytes(b"".join(recs))
    np.testing.assert_array_equal(read_bvecs(p), mat.astype(np.float32))


def test_load_sift1m_from_dir(tmp_path, rng):
    base = rng.standard_normal((20, 8)).astype(np.float32)
    query = rng.standard_normal((4, 8)).astype(np.float32)
    _write_fvecs(tmp_path / "sift_base.fvecs", base)
    _write_fvecs(tmp_path / "sift_query.fvecs", query)
    got = load_sift1m(str(tmp_path))
    np.testing.assert_array_equal(got[0], base)
    np.testing.assert_array_equal(got[1], query)
    assert load_sift1m(str(tmp_path / "missing")) is None


def test_sift_like_structure():
    base, q = sift_like(2000, dim=128, seed=0, n_clusters=64, queries=100)
    assert base.shape == (2000, 128) and q.shape == (100, 128)
    assert base.min() >= 0.0  # non-negative like SIFT histograms
    norms = np.linalg.norm(base, axis=1)
    assert norms.std() / norms.mean() > 0.05  # NOT normalized
    # clustered: mean nearest-neighbor distance well under mean pair distance
    d = ((base[:200, None, :] - base[None, :200, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    assert np.median(d.min(1)) < 0.25 * np.median(d[np.isfinite(d)])


def test_embedding_like_normalized():
    x = embedding_like(100, 64, seed=1)
    np.testing.assert_allclose(np.linalg.norm(x, axis=1), 1.0, rtol=1e-5)
