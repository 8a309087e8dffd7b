"""PQ tests mirroring the reference's (tests/inference/test_pq.py):
parameter validation, chunk layout, deterministic nearest-centroid
assignment, end-to-end compress shape/range — plus the new decode/ADC paths
the reference lacks."""

import numpy as np
import pytest

from vector_db_tpu.index.pq import PQCodec, ProductQuantizationService


def test_param_validation():
    with pytest.raises(ValueError):
        ProductQuantizationService(k=0, chunks=2, dim=8)
    with pytest.raises(ValueError):
        ProductQuantizationService(k=2, chunks=0, dim=8)
    with pytest.raises(ValueError):
        ProductQuantizationService(k=2, chunks=2, dim=0)
    with pytest.raises(ValueError):
        ProductQuantizationService(k=2, chunks=3, dim=8)  # not divisible


def test_embedding_validation(rng):
    svc = ProductQuantizationService(k=2, chunks=2, dim=8)
    with pytest.raises(TypeError):
        svc.compress([[1.0] * 8])
    with pytest.raises(ValueError):
        svc.compress(rng.standard_normal(8).astype(np.float32))  # 1D
    with pytest.raises(ValueError):
        svc.compress(rng.standard_normal((4, 6)).astype(np.float32))  # wrong dim


def test_compress_shape_and_range(rng):
    emb = rng.standard_normal((50, 16)).astype(np.float32)
    svc = ProductQuantizationService(k=8, chunks=4, dim=16)
    codes = svc.compress(emb)
    assert codes.shape == (50, 4)
    assert codes.dtype == np.int64
    assert codes.min() >= 0 and codes.max() < 8
    assert svc.centroids is not None
    assert len(svc.centroids) == 4
    assert svc.centroids[0].shape == (8, 4)


def test_encode_is_nearest_centroid(rng):
    emb = rng.standard_normal((40, 8)).astype(np.float32)
    codec = PQCodec(k=4, chunks=2, dim=8)
    codec.train(emb, seed=1)
    codes = codec.encode(emb)
    cbs = np.asarray(codec.codebooks)
    for m in range(2):
        sub = emb[:, m * 4 : (m + 1) * 4]
        d = np.linalg.norm(sub[:, None, :] - cbs[m][None, :, :], axis=-1)
        np.testing.assert_array_equal(codes[:, m], d.argmin(axis=1))


def test_decode_reconstruction_error_is_bounded(rng):
    # Tight clusters -> decode should nearly recover inputs.
    base = rng.standard_normal((4, 16)).astype(np.float32)
    emb = np.repeat(base, 20, axis=0) + 0.01 * rng.standard_normal(
        (80, 16)
    ).astype(np.float32)
    codec = PQCodec(k=4, chunks=4, dim=16)
    codec.train(emb, seed=0, restarts=8)
    rec = codec.decode(codec.encode(emb))
    err = np.linalg.norm(rec - emb, axis=1)
    assert np.mean(err) < 0.2


def test_adc_search_recall_vs_exact(rng):
    emb = rng.standard_normal((200, 32)).astype(np.float32)
    codec = PQCodec(k=16, chunks=8, dim=32)
    codec.train(emb, seed=0)
    codes = codec.encode(emb)
    q = rng.standard_normal((10, 32)).astype(np.float32)
    _, got = codec.adc_search(q, codes, top_k=10)
    # exact top-10
    d = ((q[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
    want = np.argsort(d, axis=1)[:, :10]
    recall = np.mean(
        [len(set(got[i]) & set(want[i])) / 10 for i in range(10)]
    )
    assert recall >= 0.5  # 8x compression; generous bar as in reference tests


def test_adc_lut_values(rng):
    emb = rng.standard_normal((30, 8)).astype(np.float32)
    codec = PQCodec(k=4, chunks=2, dim=8)
    codec.train(emb, seed=0)
    q = rng.standard_normal((3, 8)).astype(np.float32)
    lut = np.asarray(codec.adc_lut(q))
    assert lut.shape == (3, 2, 4)
    cbs = np.asarray(codec.codebooks)
    want = ((q[0, :4] - cbs[0]) ** 2).sum(-1)
    np.testing.assert_allclose(lut[0, 0], want, rtol=1e-3, atol=1e-4)


def test_train_too_few_raises(rng):
    codec = PQCodec(k=16, chunks=2, dim=8)
    with pytest.raises(ValueError):
        codec.train(rng.standard_normal((4, 8)).astype(np.float32))


def test_encode_before_train_raises(rng):
    codec = PQCodec(k=2, chunks=2, dim=8)
    with pytest.raises(ValueError, match="trained"):
        codec.encode(rng.standard_normal((4, 8)).astype(np.float32))


def test_opq_rotation_improves_reconstruction(rng):
    """On coordinate-correlated data OPQ must cut quantization error vs
    plain PQ (the rotation decorrelates subspaces)."""
    from vector_db_tpu.index.pq import PQCodec

    # strongly correlated dims: low-rank mixing
    u = rng.standard_normal((2000, 4)).astype(np.float32)
    mix = rng.standard_normal((4, 32)).astype(np.float32)
    x = (u @ mix + 0.05 * rng.standard_normal((2000, 32))).astype(np.float32)

    plain = PQCodec(k=16, chunks=8, dim=32)
    plain.train(x, seed=0, iters=25, restarts=1)
    err_plain = np.mean((plain.decode(plain.encode(x)) - x) ** 2)

    opq = PQCodec(k=16, chunks=8, dim=32)
    opq.train(x, seed=0, iters=25, restarts=1, opq_iters=6)
    assert opq.rotation is not None
    r = np.asarray(opq.rotation)
    np.testing.assert_allclose(r @ r.T, np.eye(32), atol=1e-4)  # orthogonal
    err_opq = np.mean((opq.decode(opq.encode(x)) - x) ** 2)
    assert err_opq < 0.7 * err_plain, (err_opq, err_plain)


def test_opq_hnsw_search(rng):
    """HNSW PQ traversal with OPQ rotation: exact-rerank contract holds."""
    import random as _random

    from vector_db_tpu.index.hnsw import HNSW
    from vector_db_tpu.types import Node

    u = rng.standard_normal((300, 4)).astype(np.float32)
    mix = rng.standard_normal((4, 32)).astype(np.float32)
    x = (u @ mix + 0.05 * rng.standard_normal((300, 32))).astype(np.float32)
    index = HNSW(M=8, ef_construction=40, rng=_random.Random(42))
    index.build_index([Node(id=i, embedding=x[i]) for i in range(300)])
    index.enable_pq(chunks=8, ksub=16, opq_iters=4)
    dists, ids = index.search_batch_pq(x[:5], k=3, ef=40)
    assert ids.shape == (5, 3)
    for i in range(5):
        assert ids[i, 0] == i
        assert dists[i, 0] < 2e-2  # expanded-L2 f32 rounding at this scale


def test_opq_ivf_search(rng):
    from vector_db_tpu.index.ivf import IvfIndex
    from vector_db_tpu.types import Node

    u = rng.standard_normal((300, 4)).astype(np.float32)
    mix = rng.standard_normal((4, 32)).astype(np.float32)
    x = (u @ mix + 0.05 * rng.standard_normal((300, 32))).astype(np.float32)
    index = IvfIndex(k=8)
    index.build_index([Node(id=i, embedding=x[i]) for i in range(300)])
    index.enable_pq(chunks=8, ksub=16, opq_iters=4)
    dists, ids = index.search_batch(x[:5], n_probe=8, top_k=3, pq=True)
    for i in range(5):
        assert ids[i, 0] == i
        assert dists[i, 0] < 2e-2  # expanded-L2 f32 rounding at this scale
