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
