"""approx_search_tiled (bf16/approx scan) contract vs exact_search_tiled."""

import jax.numpy as jnp
import numpy as np

from vector_db_tpu.ops.exact import (
    approx_search_tiled,
    exact_search_tiled,
    rescore_exact,
)


def test_approx_matches_exact_f32(rng):
    x = rng.standard_normal((1000, 32)).astype(np.float32)
    q = rng.standard_normal((8, 32)).astype(np.float32)
    valid = jnp.ones((1000,), bool)
    ed, ei = exact_search_tiled(jnp.asarray(q), jnp.asarray(x), valid, 10,
                                tile=256)
    ad, ai = approx_search_tiled(jnp.asarray(q), jnp.asarray(x), valid, 10,
                                 tile=256)
    # same dtype + shapes; on CPU approx_min_k is exact
    overlap = np.mean([
        len(set(np.asarray(ai)[i].tolist()) & set(np.asarray(ei)[i].tolist()))
        for i in range(8)
    ]) / 10
    assert overlap >= 0.9


def test_approx_bf16_with_rescore(rng):
    x = rng.standard_normal((512, 32)).astype(np.float32)
    q = x[:4] + 1e-4  # near-self queries
    valid = jnp.ones((512,), bool)
    x_dev = jnp.asarray(x)
    ad, ai = approx_search_tiled(
        jnp.asarray(q), x_dev.astype(jnp.bfloat16), valid, 5, tile=256,
        x_sq=jnp.sum(x_dev * x_dev, axis=-1),
    )
    rd, ri = rescore_exact(jnp.asarray(q), x_dev, ai)
    ri = np.asarray(ri)
    rd = np.asarray(rd)
    for i in range(4):
        assert ri[i, 0] == i          # self row wins after exact re-score
        assert rd[i, 0] < 1e-4        # exact distance, not bf16-rounded
        assert np.all(np.diff(rd[i]) >= 0)  # sorted ascending


def test_approx_respects_valid_mask(rng):
    x = rng.standard_normal((300, 16)).astype(np.float32)
    q = x[:2]
    valid_np = np.ones((300,), bool)
    valid_np[:2] = False  # mask out the self rows
    ad, ai = approx_search_tiled(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid_np), 5, tile=128
    )
    ai = np.asarray(ai)
    assert 0 not in ai[0] and 1 not in ai[1]
