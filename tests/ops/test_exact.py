import jax.numpy as jnp
import numpy as np

from vector_db_tpu.ops.exact import exact_search, exact_search_tiled


def brute_force(q, x, k):
    d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1)[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def test_exact_search_matches_brute_force(rng):
    x = rng.standard_normal((200, 16)).astype(np.float32)
    q = rng.standard_normal((5, 16)).astype(np.float32)
    valid = np.ones(200, bool)
    d, i = exact_search(jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), 10)
    wd, wi = brute_force(q, x, 10)
    np.testing.assert_array_equal(np.asarray(i), wi)
    np.testing.assert_allclose(np.asarray(d), wd, rtol=1e-3, atol=1e-3)


def test_exact_search_respects_valid_mask(rng):
    x = rng.standard_normal((50, 8)).astype(np.float32)
    q = x[7:8]  # exact match at slot 7
    valid = np.ones(50, bool)
    valid[7] = False
    _, i = exact_search(jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), 5)
    assert 7 not in np.asarray(i)


def test_exact_search_pads_when_too_few_valid(rng):
    x = rng.standard_normal((6, 8)).astype(np.float32)
    valid = np.zeros(6, bool)
    valid[:3] = True
    q = rng.standard_normal((1, 8)).astype(np.float32)
    d, i = exact_search(jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), 5)
    i = np.asarray(i)[0]
    assert set(i[:3]) <= {0, 1, 2}
    assert list(i[3:]) == [-1, -1]


def test_exact_search_tiled_matches_single_tile(rng):
    x = rng.standard_normal((1000, 24)).astype(np.float32)
    q = rng.standard_normal((4, 24)).astype(np.float32)
    valid = np.ones(1000, bool)
    valid[100:200] = False
    d1, i1 = exact_search(jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), 12)
    d2, i2 = exact_search_tiled(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), 12, tile=256
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-3, atol=1e-3)


def test_exact_search_self_query_distance_near_zero(rng):
    x = rng.standard_normal((100, 16)).astype(np.float32)
    q = x[:3]
    d, i = exact_search(jnp.asarray(q), jnp.asarray(x), jnp.ones(100, bool), 1)
    np.testing.assert_array_equal(np.asarray(i)[:, 0], [0, 1, 2])
    assert np.all(np.sqrt(np.asarray(d)) < 1e-3)
