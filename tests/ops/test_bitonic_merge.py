"""Bitonic sort-by-key kernel (ops/pallas/bitonic_merge.py), interpret
mode: exact top-k with payload must equal the numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from vector_db_tpu.ops.pallas.bitonic_merge import sorted_topk


@pytest.mark.parametrize("n,topk", [(64, 16), (100, 32), (4864, 1280)])
def test_sorted_topk_matches_numpy(rng, n, topk):
    b = 8
    d = rng.standard_normal((b, n)).astype(np.float32)
    v = rng.integers(0, 1 << 20, (b, n)).astype(np.int32)
    od, ov = sorted_topk(jnp.asarray(d), jnp.asarray(v), topk,
                         block_b=8, interpret=True)
    order = np.argsort(d, axis=1, kind="stable")[:, :topk]
    np.testing.assert_array_equal(
        np.asarray(od), np.take_along_axis(d, order, axis=1))
    np.testing.assert_array_equal(
        np.asarray(ov), np.take_along_axis(v, order, axis=1))


def test_sorted_topk_ties_and_padding(rng):
    # equal keys land adjacent (order among ties is arbitrary) and every
    # (key, payload) pair survives exactly once; pad-to-pow2 works
    b, n, topk = 4, 48, 48
    d = np.repeat(rng.standard_normal((b, n // 4)).astype(np.float32),
                  4, axis=1)
    v = np.arange(b * n, dtype=np.int32).reshape(b, n)
    od, ov = sorted_topk(jnp.asarray(d), jnp.asarray(v), topk,
                         block_b=4, interpret=True)
    od, ov = np.asarray(od), np.asarray(ov)
    assert np.all(np.diff(od, axis=1) >= 0)
    for i in range(b):
        assert sorted(ov[i].tolist()) == sorted(v[i].tolist())
        got = dict(zip(ov[i].tolist(), od[i].tolist()))
        want = dict(zip(v[i].tolist(), d[i].tolist()))
        assert got == want
