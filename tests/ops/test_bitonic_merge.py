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


@pytest.mark.parametrize("p,k,topk", [(16, 48, 16), (100, 156, 100),
                                      (1280, 3584, 1280)])
def test_presorted_merge_matches_full_sort(rng, p, k, topk):
    # the wide-beam steady state: sorted pool prefix + unsorted
    # candidate suffix; presorted path must equal the full-sort oracle
    b = 8
    dp = np.sort(rng.standard_normal((b, p)).astype(np.float32), axis=1)
    dk = rng.standard_normal((b, k)).astype(np.float32)
    # sprinkle BIG masking into both segments (masked pool tail +
    # invalid candidates), as wide_search produces
    dp[:, -3:] = 3.0e38
    dk[:, :: 7] = 3.0e38
    d = np.concatenate([dp, dk], axis=1)
    v = rng.integers(0, 1 << 20, (b, p + k)).astype(np.int32)
    od, ov = sorted_topk(jnp.asarray(d), jnp.asarray(v), topk,
                         block_b=8, interpret=True, presorted=p)
    rd, rv = sorted_topk(jnp.asarray(d), jnp.asarray(v), topk,
                         block_b=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(od), np.asarray(rd))
    # payloads match wherever keys are unique; at BIG ties only the
    # key panel is defined
    order = np.argsort(d, axis=1, kind="stable")[:, :topk]
    np.testing.assert_array_equal(
        np.asarray(od), np.take_along_axis(d, order, axis=1))
    uniq = np.asarray(od) < 3.0e38
    np.testing.assert_array_equal(
        np.where(uniq, np.asarray(ov), -1), np.where(uniq, np.asarray(rv), -1))


def test_husked_prefix_needs_full_sort(rng):
    # the wide-beam window dedup voids duplicate pool entries to BIG IN
    # PLACE, so the steady-state pool prefix is "ascending with BIG
    # bumps" — NOT non-decreasing, hence not a valid ``presorted`` claim
    # (restoring order is 0/1 stable compaction = a full sorting
    # network). wide_search therefore routes dedup_window > 0 through
    # presorted=0; this pins the full-sort path on exactly that input.
    b, p, k, topk = 8, 128, 384, 128
    dp = np.sort(rng.standard_normal((b, p)).astype(np.float32), axis=1)
    husk = rng.random((b, p)) < 0.15
    husk[:, -1] = True  # at least one mid/tail bump per row
    dp = np.where(husk, np.float32(3.0e38), dp)
    dk = rng.standard_normal((b, k)).astype(np.float32)
    d = np.concatenate([dp, dk], axis=1)
    v = rng.integers(0, 1 << 20, (b, p + k)).astype(np.int32)
    od, ov = sorted_topk(jnp.asarray(d), jnp.asarray(v), topk,
                         block_b=8, interpret=True)
    order = np.argsort(d, axis=1, kind="stable")[:, :topk]
    np.testing.assert_array_equal(
        np.asarray(od), np.take_along_axis(d, order, axis=1))
    np.testing.assert_array_equal(
        np.asarray(ov), np.take_along_axis(v, order, axis=1))


def test_presorted_bf16_keys(rng):
    # wide_search carries the pool in bf16
    b, p, k = 4, 64, 192
    dp = np.sort(rng.standard_normal((b, p)).astype(np.float32), axis=1)
    dk = rng.standard_normal((b, k)).astype(np.float32)
    d = jnp.asarray(np.concatenate([dp, dk], axis=1)).astype(jnp.bfloat16)
    dp2 = np.sort(np.asarray(d[:, :p], np.float32), axis=1)  # bf16 grid
    d = jnp.concatenate([jnp.asarray(dp2).astype(jnp.bfloat16),
                         d[:, p:]], axis=1)
    v = jnp.asarray(rng.integers(0, 1 << 20, (b, p + k)).astype(np.int32))
    od, ov = sorted_topk(d, v, p, block_b=4, interpret=True, presorted=p)
    dd = np.asarray(d, np.float32)
    np.testing.assert_array_equal(
        np.asarray(od, np.float32), np.sort(dd, axis=1)[:, :p])


def test_blocked_network_wide_rows():
    # n > 4096 routes through the blocked kernel (slice sort +
    # merge-halve rounds); exact top-k vs numpy at the wide-beam width
    rng = np.random.default_rng(9)
    b, n, topk = 4, 15616, 1280   # pads to 16384 = 8 x 2048 slices
    d = rng.standard_normal((b, n)).astype(np.float32)
    v = rng.integers(0, 1 << 20, (b, n)).astype(np.int32)
    od, ov = sorted_topk(jnp.asarray(d), jnp.asarray(v), topk,
                         block_b=4, interpret=True)
    order = np.argsort(d, axis=1, kind="stable")[:, :topk]
    np.testing.assert_allclose(np.asarray(od),
                               np.take_along_axis(d, order, axis=1),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(ov),
                                  np.take_along_axis(v, order, axis=1))


def test_blocked_network_topk_above_2048():
    rng = np.random.default_rng(10)
    b, n, topk = 2, 12288, 3000   # w = pow2(3000) = 4096, n pads 16384
    d = rng.standard_normal((b, n)).astype(np.float32)
    v = np.arange(b * n, dtype=np.int32).reshape(b, n)
    od, ov = sorted_topk(jnp.asarray(d), jnp.asarray(v), topk,
                         block_b=2, interpret=True)
    order = np.argsort(d, axis=1, kind="stable")[:, :topk]
    np.testing.assert_allclose(np.asarray(od),
                               np.take_along_axis(d, order, axis=1))
    np.testing.assert_array_equal(np.asarray(ov),
                                  np.take_along_axis(v, order, axis=1))
