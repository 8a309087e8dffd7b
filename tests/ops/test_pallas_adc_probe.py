"""Interpret-mode validation of the fused IVF-PQ probe kernel
(ops/pallas/adc_probe.py) against a numpy LUT-gather oracle."""

import numpy as np
import jax.numpy as jnp

from vector_db_tpu.ops.pallas.adc_probe import BIG, adc_probe_scores


def _oracle(lut, codes_t, corr, valid):
    b, m, ksub = lut.shape
    p = codes_t.shape[2]
    out = np.zeros((b, p), np.float32)
    for q in range(b):
        for i in range(p):
            s = sum(lut[q, j, codes_t[q, j, i]] for j in range(m))
            out[q, i] = s + corr[q, i] if valid[q, i] else BIG
    return out


def test_adc_probe_matches_oracle(rng):
    b, m, ksub, p = 3, 4, 16, 70  # odd P exercises the tile padding
    lut = rng.standard_normal((b, m, ksub)).astype(np.float32)
    codes = rng.integers(0, ksub, (b, m, p)).astype(np.int32)
    corr = rng.standard_normal((b, p)).astype(np.float32)
    valid = rng.random((b, p)) > 0.2

    got = np.asarray(adc_probe_scores(
        jnp.asarray(lut), jnp.asarray(codes), jnp.asarray(corr),
        jnp.asarray(valid), tile=32, interpret=True))
    want = _oracle(lut, codes, corr, valid)
    # hi/lo bf16 LUT pair: exact to ~2^-16 relative per term
    ok = valid
    np.testing.assert_allclose(got[ok], want[ok], rtol=2e-4, atol=2e-4)
    assert np.all(got[~ok] >= BIG)


def test_adc_probe_production_shape(rng):
    """The 1M-class probe shape (m=16, ksub=256, tile=1024) in interpret
    mode on a thin slice: one query block row, two tiles."""
    b, m, ksub, p = 2, 16, 256, 2048
    lut = (rng.standard_normal((b, m, ksub)) ** 2).astype(np.float32)
    codes = rng.integers(0, ksub, (b, m, p)).astype(np.int32)
    corr = np.zeros((b, p), np.float32)
    valid = np.ones((b, p), bool)

    got = np.asarray(adc_probe_scores(
        jnp.asarray(lut), jnp.asarray(codes), jnp.asarray(corr),
        jnp.asarray(valid), tile=1024, interpret=True))
    idx = np.arange(p)
    want = np.stack([
        lut[q, np.arange(m)[:, None], codes[q, :, idx].T].sum(axis=0)
        for q in range(b)])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)
