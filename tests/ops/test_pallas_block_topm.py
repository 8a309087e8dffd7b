"""block_topm_scan (fused per-block top-m kernel) vs the XLA oracle.

Interpret mode on CPU; the on-chip compile check lives in
scripts/pallas_onchip.py (BENCH_PALLAS.json).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vector_db_tpu.ops.pallas.block_topm import block_topm_scan


def _oracle(q, tab, xsq_eff, block, m, tile):
    """Per-block top-m values + global row ids, computed the slow way."""
    n = tab.shape[0]
    pad = (-n) % tile
    cross = jnp.dot(q.astype(tab.dtype), tab.T,
                    preferred_element_type=jnp.float32)
    d = xsq_eff[None, :] - 2.0 * cross
    if pad:
        d = jnp.concatenate(
            [d, jnp.full((q.shape[0], pad), 2.0e38)], axis=1)
    b, n_pad = d.shape
    db = np.asarray(d).reshape(b, n_pad // block, block)
    order = np.argsort(db, axis=-1, kind="stable")[..., :m]
    vals = np.take_along_axis(db, order, axis=-1)      # [b, nb, m]
    rows = order + (np.arange(n_pad // block) * block)[None, :, None]
    return vals.reshape(b, -1), rows.reshape(b, -1)


@pytest.mark.parametrize("n,ds,b,m", [(4096 + 512, 64, 37, 4),
                                      (2048, 128, 8, 2)])
def test_matches_xla_oracle(n, ds, b, m):
    rng = np.random.default_rng(0)
    tab = jnp.asarray(
        rng.standard_normal((n, ds)).astype(np.float32)
    ).astype(jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, ds)).astype(np.float32))
    xsq = jnp.asarray((rng.random(n) * 10).astype(np.float32))
    vm = np.ones(n, bool)
    vm[::13] = False
    xsq_eff = jnp.where(jnp.asarray(vm), xsq, 2.0e38)

    vals, rows = block_topm_scan(q, tab, xsq_eff, block=128, m=m,
                                 tile=1024, qtile=64, interpret=True)
    ov, orw = _oracle(q, tab, xsq_eff, 128, m, 1024)
    assert vals.shape == ov.shape and rows.shape == orw.shape
    np.testing.assert_allclose(np.asarray(vals), ov, rtol=1e-6, atol=1e-5)
    # row ids must agree wherever the values are distinct (ties may
    # legitimately resolve to a different member); verify by value
    got = np.asarray(rows)
    d_full = ov  # oracle vals
    mism = got != orw
    if mism.any():
        # any mismatched id must still carry an equal distance (tie)
        bi, ji = np.nonzero(mism)
        np.testing.assert_allclose(np.asarray(vals)[bi, ji],
                                   d_full[bi, ji], rtol=1e-6, atol=1e-5)


def test_two_phase_matches_exact():
    from vector_db_tpu.ops.exact import (
        block_select_search_2p,
        exact_search_tiled,
    )

    rng = np.random.default_rng(3)
    n, d_dim, b, k = 8192, 64, 16, 5
    a = rng.standard_normal((24, d_dim)).astype(np.float32)
    x = (rng.standard_normal((n, 24)).astype(np.float32) @ a
         + 0.01 * rng.standard_normal((n, d_dim)).astype(np.float32))
    q = (rng.standard_normal((b, 24)).astype(np.float32) @ a
         + 0.01 * rng.standard_normal((b, d_dim)).astype(np.float32))
    emb, qd = jnp.asarray(x), jnp.asarray(q)
    valid = jnp.ones((n,), bool)
    xsq = jnp.sum(emb * emb, -1)
    cov = np.asarray(jnp.dot(emb.T, emb)) / n
    _, v = np.linalg.eigh(cov.astype(np.float64))
    proj = jnp.asarray(v[:, ::-1][:, :32].astype(np.float32))
    tab = jnp.dot(emb, proj).astype(jnp.bfloat16)
    qp = jnp.dot(qd, proj)
    gd, gi = exact_search_tiled(qd, emb, valid, k, tile=1024)
    dd, ii = block_select_search_2p(qd, tab, qp, xsq, emb, valid, k,
                                    block=128, m=4, rows_k=64,
                                    p1_tile=1024, p1_qtile=64)
    np.testing.assert_array_equal(np.asarray(ii), np.asarray(gi))
    np.testing.assert_allclose(np.asarray(dd), np.asarray(gd), rtol=1e-5)


def test_deleted_rows_never_returned():
    from vector_db_tpu.ops.exact import block_select_search_2p

    rng = np.random.default_rng(7)
    n, d_dim, b, k = 2048, 32, 8, 10
    emb = jnp.asarray(rng.standard_normal((n, d_dim)).astype(np.float32))
    qd = emb[:b] + 0.01  # queries near deleted rows
    valid = jnp.asarray(np.arange(n) % 2 == 1)  # evens deleted (incl. 0..b)
    xsq = jnp.sum(emb * emb, -1)
    tab = emb.astype(jnp.bfloat16)
    dd, ii = block_select_search_2p(qd, tab, qd, xsq, emb, valid, k,
                                    block=128, m=4, rows_k=64,
                                    p1_tile=1024, p1_qtile=64)
    ids = np.asarray(ii)
    assert ((ids == -1) | (ids % 2 == 1)).all()
    assert (ids >= 0).any()  # and it does return live neighbors
