"""ADC path equivalence: matmul formulation == gather formulation."""

import numpy as np

from vector_db_tpu.index.pq import PQCodec


def test_adc_matmul_equals_gather(rng):
    emb = rng.standard_normal((500, 32)).astype(np.float32)
    codec = PQCodec(k=16, chunks=8, dim=32)
    codec.train(emb, seed=0)
    codes = codec.encode(emb)
    q = rng.standard_normal((7, 32)).astype(np.float32)

    d_g, i_g = codec.adc_search(q, codes, top_k=10, mode="gather")
    d_m, i_m = codec.adc_search(q, codes, top_k=10, mode="matmul")
    np.testing.assert_array_equal(i_g, i_m)
    np.testing.assert_allclose(d_g, d_m, rtol=1e-3, atol=1e-3)


def test_adc_matmul_with_padding_and_valid(rng):
    emb = rng.standard_normal((300, 16)).astype(np.float32)
    codec = PQCodec(k=8, chunks=4, dim=16)
    codec.train(emb, seed=1)
    codes = codec.encode(emb)
    import jax.numpy as jnp

    valid = np.ones(300, bool)
    valid[42] = False
    q = emb[42:43]
    _, ids = codec.adc_search(q, codes, valid=jnp.asarray(valid), top_k=5)
    assert 42 not in ids[0]
