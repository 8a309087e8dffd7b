"""Pallas fused L2+top-k kernel vs the XLA exact path (interpret mode on
CPU; the same kernel compiles for TPU)."""

import jax.numpy as jnp
import numpy as np

from vector_db_tpu.ops.exact import exact_search
from vector_db_tpu.ops.pallas.l2_topk import l2_topk


def test_l2_topk_matches_exact(rng):
    x = rng.standard_normal((500, 64)).astype(np.float32)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    valid = np.ones(500, bool)
    valid[100:150] = False
    d1, i1 = exact_search(jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), 10)
    d2, i2 = l2_topk(jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), 10,
                     tile=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-3, atol=1e-3)


def test_l2_topk_few_valid(rng):
    x = rng.standard_normal((100, 32)).astype(np.float32)
    q = rng.standard_normal((2, 32)).astype(np.float32)
    valid = np.zeros(100, bool)
    valid[:3] = True
    d, i = l2_topk(jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), 5,
                   tile=64, interpret=True)
    i = np.asarray(i)
    assert set(i[0][:3]) <= {0, 1, 2}
    assert list(i[0][3:]) == [-1, -1]
