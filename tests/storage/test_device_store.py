"""DeviceVectorStore: slots, growth, recycling, id translation."""

import numpy as np
import pytest

from vector_db_tpu.storage.device_store import DeviceVectorStore


def test_take_write_translate(rng):
    s = DeviceVectorStore(capacity=8)
    s.ensure_dim(4)
    embs = rng.standard_normal((3, 4)).astype(np.float32)
    slots = s.take_slots([10, 20, 30])
    s.write(slots, embs)
    assert s.size == 3
    assert s.slot_of(20) == 1
    assert 20 in s and 99 not in s
    np.testing.assert_array_equal(s.ids_of(np.array([0, 2, -1])), [10, 30, -1])
    np.testing.assert_allclose(np.asarray(s.emb)[slots], embs, rtol=1e-6)
    assert np.asarray(s.valid)[:3].all()


def test_growth_calls_hook(rng):
    calls = []
    s = DeviceVectorStore(capacity=4, on_grow=lambda a, b: calls.append((a, b)))
    s.ensure_dim(2)
    s.take_slots(range(10))
    assert s.capacity >= 10
    assert calls and calls[0][0] == 4
    # id map survived growth
    assert s.slot_of(9) is not None


def test_release_and_recycle(rng):
    s = DeviceVectorStore(capacity=4)
    s.ensure_dim(2)
    slots = s.take_slots([1, 2])
    s.write(slots, np.ones((2, 2), np.float32))
    freed = s.release(1)
    assert freed == slots[0]
    assert not np.asarray(s.valid)[freed]
    assert s.release(1) is None
    # freed slot is reused
    assert s.take_slot(5) == freed


def test_filter_mask(rng):
    s = DeviceVectorStore(capacity=8)
    s.ensure_dim(2)
    s.take_slots([7, 8, 9])
    m = s.filter_mask({8, 99})
    assert m[s.slot_of(8)]
    assert m.sum() == 1


def test_import_export_id_map():
    s = DeviceVectorStore(capacity=4)
    s.ensure_dim(2)
    s.take_slots([5, 6])
    exported = s.export_id_map().copy()
    s2 = DeviceVectorStore(capacity=4)
    s2.import_id_map(exported)
    s2.ensure_dim(2)  # must not clobber the imported map
    assert s2.slot_of(6) == 1
    assert s2.size == 2
    # free slots recomputed
    assert s2.take_slot(7) == 2


def test_dim_mismatch():
    s = DeviceVectorStore(capacity=4)
    s.ensure_dim(2)
    with pytest.raises(ValueError):
        s.ensure_dim(3)


def test_filter_mask_vectorized_path(rng):
    """Large filter sets route through the cached sorted-id view; the
    result must match the per-id loop across mutations (adds, deletes,
    unknown ids, negative ids)."""
    import numpy as np

    n = 6000
    s = DeviceVectorStore(capacity=8192)
    s.ensure_dim(4)
    ids = [int(i) * 7 + 3 for i in range(n)]   # sparse, non-contiguous
    s.take_slots(ids)
    # delete a scattered subset (mutation invalidates the cache)
    for nid in ids[::17]:
        s.release(nid)
    live = [i for k, i in enumerate(ids) if k % 17 != 0]
    big = set(live[: n // 2]) | {-5, 10**9, 4}  # unknowns + negative
    got = s.filter_mask(big)

    want = np.zeros((s.capacity,), bool)
    for nid in big:
        slot = s.slot_of(int(nid))
        if slot is not None:
            want[slot] = True
    np.testing.assert_array_equal(got, want)
    # cache reuse on a second call must stay correct
    np.testing.assert_array_equal(s.filter_mask(big), want)
    # mutate, then query again (stale-cache guard)
    s.take_slot(12345)
    got2 = s.filter_mask(set(list(big) + [12345]))
    assert got2[s.slot_of(12345)]
