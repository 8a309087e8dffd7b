import jax.numpy as jnp
import numpy as np

from vector_db_tpu.ops.distance import (
    cosine_distance_pairwise,
    gather_l2_sq,
    l2_sq_pairwise,
    BIG,
)
from vector_db_tpu.util.distance import euclidean_vector_distance


def test_l2_sq_pairwise_matches_numpy(rng):
    q = rng.standard_normal((7, 16)).astype(np.float32)
    x = rng.standard_normal((23, 16)).astype(np.float32)
    got = np.asarray(l2_sq_pairwise(jnp.asarray(q), jnp.asarray(x)))
    want = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_l2_matches_reference_pair_distance(rng):
    v1 = rng.standard_normal(32).astype(np.float32)
    v2 = rng.standard_normal(32).astype(np.float32)
    d_sq = float(l2_sq_pairwise(jnp.asarray(v1[None]), jnp.asarray(v2[None]))[0, 0])
    assert abs(np.sqrt(d_sq) - euclidean_vector_distance(v1, v2)) < 1e-4


def test_self_distance_is_zero(rng):
    x = rng.standard_normal((5, 8)).astype(np.float32)
    d = np.asarray(l2_sq_pairwise(jnp.asarray(x), jnp.asarray(x)))
    assert np.all(np.diag(d) < 1e-6)
    assert np.all(d >= 0.0)


def test_cosine_pairwise(rng):
    q = rng.standard_normal((3, 8)).astype(np.float32)
    x = rng.standard_normal((5, 8)).astype(np.float32)
    got = np.asarray(cosine_distance_pairwise(jnp.asarray(q), jnp.asarray(x)))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    np.testing.assert_allclose(got, 1.0 - qn @ xn.T, rtol=1e-4, atol=1e-4)


def test_gather_l2_sq_masks_invalid(rng):
    emb = rng.standard_normal((10, 4)).astype(np.float32)
    q = rng.standard_normal(4).astype(np.float32)
    idx = jnp.asarray([0, 3, -1, 7], dtype=jnp.int32)
    valid = jnp.asarray([True, False, True, True])
    d = np.asarray(gather_l2_sq(jnp.asarray(q), jnp.asarray(emb), idx, valid))
    assert abs(d[0] - ((q - emb[0]) ** 2).sum()) < 1e-3
    assert d[1] >= BIG  # invalid flag
    assert d[2] >= BIG  # -1 padding
    assert abs(d[3] - ((q - emb[7]) ** 2).sum()) < 1e-3
