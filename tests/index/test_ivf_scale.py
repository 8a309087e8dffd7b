"""Scale-path IVF: build_arrays (subsampled k-means + tiled assign +
bounded lists) and the cell-contiguous IVF-PQ probe.

Contracts mirrored from the reference IvfIndex (src/vector_db/indexing/
ivf.py:52-199): build -> search returns nearest neighbors; plus the
rebuild-specific guarantees — bounded cell sizes and ADC+rerank recall.
"""

import numpy as np
import pytest

from vector_db_tpu.index.ivf import IvfIndex
from vector_db_tpu.ops.exact import exact_search
import jax.numpy as jnp


def _corpus(n=4096, dim=64, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((32, dim)).astype(np.float32) * 3
    x = centers[rng.integers(0, 32, n)] + rng.standard_normal(
        (n, dim)
    ).astype(np.float32)
    return x.astype(np.float32)


@pytest.fixture(scope="module")
def built():
    x = _corpus()
    index = IvfIndex(k=32)
    index.build_arrays(range(len(x)), x, seed=1, iters=15)
    return index, x


def _exact_gt(index, q, k):
    d, slots = exact_search(jnp.asarray(q), index._emb, index._has_emb, k)
    return index._store.ids_of(np.asarray(slots))


def test_build_arrays_search_recall(built):
    index, x = built
    q = x[:64] + 0.01
    gt = _exact_gt(index, q, 10)
    _, ids = index.search_batch(q, n_probe=8, top_k=10)
    recall = np.mean([
        len(set(ids[i].tolist()) & set(gt[i].tolist())) / 10
        for i in range(len(q))
    ])
    assert recall >= 0.9


def test_build_arrays_all_probed_is_exact(built):
    index, x = built
    q = x[200:210]
    gt = _exact_gt(index, q, 5)
    _, ids = index.search_batch(q, n_probe=32, top_k=5)
    assert np.array_equal(np.sort(ids, axis=1), np.sort(gt, axis=1))


def test_bounded_lists(built):
    index, x = built
    cap = int(np.ceil(4.0 * len(x) / index.k))
    sizes = [len(l) for l in index.inverted_lists]
    assert sum(sizes) == len(x)
    assert max(sizes) <= cap + 1  # waived-cap stragglers are rare
    # every id lands in exactly one list
    all_ids = [i for l in index.inverted_lists for i in l]
    assert len(set(all_ids)) == len(x)


def test_pq_cells_probe_recall(built):
    index, x = built
    index.enable_pq(chunks=8, ksub=64, opq_iters=0)
    q = x[300:364] + 0.01
    gt = _exact_gt(index, q, 10)

    def recall(ids):
        return np.mean([
            len(set(ids[i].tolist()) & set(gt[i].tolist())) / 10
            for i in range(len(q))
        ])

    # probe recall (exact scoring of probed cells) is the ceiling; ADC
    # fetch + exact rerank must approach it as fetch widens
    _, ids_exact = index.search_batch(q, n_probe=8, top_k=10)
    _, ids_pq = index.search_batch(
        q, n_probe=8, top_k=10, pq=True, fetch=256
    )
    assert recall(ids_pq) >= recall(ids_exact) - 0.05


def test_pq_rerank_distances_are_exact(built):
    index, x = built
    q = x[10:13]
    dists, ids = index.search_batch(q, n_probe=32, top_k=3, pq=True)
    for r in range(3):
        for c in range(3):
            if ids[r, c] < 0:
                continue
            want = np.linalg.norm(q[r] - x[ids[r, c]])
            # f32 norm²-2·cross+norm² decomposition carries ~1e-3 abs
            # error near zero (catastrophic cancellation) — rerank is
            # "exact" in the f32-decomposition sense, like exact_search
            assert dists[r, c] == pytest.approx(want, rel=1e-3, abs=0.05)


def test_add_after_enable_pq_updates_codes():
    x = _corpus(n=512, dim=32, seed=3)
    index = IvfIndex(k=8)
    index.build_arrays(range(len(x)), x, seed=1, iters=10)
    index.enable_pq(chunks=4, ksub=32)
    from vector_db_tpu.types import Node

    # well-separated from every base row so f32 cancellation noise
    # (~1e-3) cannot flip the ranking
    rng = np.random.default_rng(9)
    v = x[7] + rng.standard_normal(x.shape[1]).astype(np.float32)
    index.add(Node(id=10_000, embedding=v.tolist(), metadata={}))
    _, ids = index.search_batch(v[None, :], n_probe=8, top_k=1, pq=True)
    assert ids[0, 0] == 10_000


def test_balanced_assign_caps_and_fallback():
    index = IvfIndex(k=4)
    # 12 rows all wanting cluster 0 first; candidates [0, 1]
    cand = np.tile(np.array([[0, 1]], np.int32), (12, 1))
    labels = index._balanced_assign(cand, alpha=1.0)  # cap = 3
    counts = np.bincount(labels, minlength=4)
    # 3 under cap each; the 6 stragglers go to a least-loaded CANDIDATE
    # (never an unbounded waiver — padded tensors scale with max cell)
    assert counts[0] + counts[1] == 12
    assert counts[0] >= 3 and counts[1] >= 3
    assert max(counts) <= 9  # bounded: stragglers spread over candidates


def test_residual_pq_beats_raw_pq_adc():
    """Residual IVFADC (encode x − c_cell) must estimate distances better
    than raw-vector PQ on clustered data: the coarse quantizer absorbs the
    cluster mean so the code budget covers only intra-cell variance
    (Jégou et al. IVFADC; reference PQ computes no distances at all,
    src/vector_db/inference/pq.py:77-108)."""
    x = _corpus(n=4096, dim=64, seed=11)
    q = _corpus(n=64, dim=64, seed=12)
    d_all = ((x[None, :, :] - q[:, None, :]) ** 2).sum(-1)
    gt = np.argsort(d_all, axis=1)[:, :10]

    recalls = {}
    for residual in (False, True):
        index = IvfIndex(k=32)
        index.build_arrays(range(len(x)), x, seed=1, iters=15)
        index.enable_pq(chunks=8, ksub=64, residual=residual)
        _, ids = index.search_batch(q, n_probe=16, top_k=10, pq=True,
                                    rerank=False)
        recalls[residual] = np.mean([
            len(set(ids[i].tolist()) & set(gt[i].tolist())) / 10
            for i in range(len(q))
        ])
    assert recalls[True] > recalls[False]
    # isotropic unit-Gaussian residuals are PQ's worst case; the absolute
    # bar is deliberately modest — the contract is the relative gain
    assert recalls[True] >= 0.25


def test_residual_pq_distance_identity():
    """The stored-scalar decomposition must reproduce the directly-computed
    residual ADC distance: Σ_j lut[code_j] + s_x + (‖q−c‖² − ‖q‖²)
    == ‖q − c − recon‖² for the quantized reconstruction."""
    x = _corpus(n=1024, dim=32, seed=21)
    index = IvfIndex(k=8)
    index.build_arrays(range(len(x)), x, seed=2, iters=10)
    index.enable_pq(chunks=4, ksub=32, residual=True, opq_iters=3)
    q = x[5][None, :] + 0.25

    # probe all-but-one cell, no rerank: returned d = sqrt(ADC estimate).
    # (n_probe >= k routes to the one-hot-matmul SCAN kernel whose bf16
    # LUT rounds ~0.4% — the gather probe kernel is the exact-identity
    # reference; the scan path is covered by test_pq_scan_mode_full_probe)
    d, ids = index.search_batch(q, n_probe=7, top_k=5, pq=True, rerank=False)
    cell_of = {}
    for c, lst in enumerate(index.inverted_lists):
        for nid in lst:
            cell_of[nid] = c
    for j in range(5):
        nid = int(ids[0, j])
        slot = index._store.slot_of(nid)
        code = index._codes_np[slot].astype(np.int32)[None, :]
        recon = index._pq.decode(code)[0]           # original space
        c = index.centroids[cell_of[nid]]
        want = float(((q[0] - c - recon) ** 2).sum())
        assert d[0, j] ** 2 == pytest.approx(want, rel=1e-3, abs=0.05)


def test_residual_add_after_enable_pq():
    """add() must keep residual codes AND the correction scalar current."""
    from vector_db_tpu.types import Node

    x = _corpus(n=512, dim=32, seed=3)
    index = IvfIndex(k=8)
    index.build_arrays(range(len(x)), x, seed=1, iters=10)
    index.enable_pq(chunks=4, ksub=32, residual=True, opq_iters=2)
    rng = np.random.default_rng(9)
    v = x[7] + rng.standard_normal(x.shape[1]).astype(np.float32)
    index.add(Node(id=10_000, embedding=v.tolist(), metadata={}))
    d, ids = index.search_batch(v[None, :], n_probe=8, top_k=1, pq=True)
    assert ids[0, 0] == 10_000
    assert d[0, 0] < 0.5  # a wrong s_x would shift the estimate far off


# ---------------------------------------------------------------------------
# residual-projection (RP) scoring + spilled assignment
# ---------------------------------------------------------------------------

def _lowrank_corpus(n, dim=64, rank=8, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((n, rank)).astype(np.float32)
    v = rng.standard_normal((rank, dim)).astype(np.float32)
    x = u @ v + 0.05 * rng.standard_normal((n, dim)).astype(np.float32)
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


def test_rp_matches_exact_probe_recall():
    """With dims >= intrinsic rank the projected bf16 scoring must find the
    same neighbors as exact-embedding probing (the decomposition
    ‖q−c‖² − ‖q̂−ĉ‖² + ‖q̂−x̂‖² is lossless when x−c lies in span(R))."""
    data = _lowrank_corpus(4096 + 32)
    x, q = data[:4096], data[4096:]
    ivf = IvfIndex(k=32)
    ivf.build_arrays(range(4096), x, seed=0, iters=15)
    ivf.enable_rp(dims=16)
    _, ids_rp = ivf.search_batch(q, n_probe=8, top_k=10, rp=True, fetch=64)
    _, ids_ex = ivf.search_batch(q, n_probe=8, top_k=10)
    match = np.mean([
        len(set(ids_rp[i].tolist()) & set(ids_ex[i].tolist())) / 10
        for i in range(32)
    ])
    assert match >= 0.95


def test_spill_raises_probe_recall():
    """Multi-assignment must improve recall at fixed n_probe on
    low-intrinsic-dimension data (neighbors straddle cell boundaries)."""
    data = _lowrank_corpus(8192 + 64, seed=3)
    x, q = data[:8192], data[8192:]
    gt = np.argsort(((x[None, :, :] - q[:, None, :]) ** 2).sum(-1),
                    axis=1)[:, :10]

    def recall(ids):
        return np.mean([len(set(ids[i].tolist()) & set(gt[i].tolist())) / 10
                        for i in range(64)])

    recs = {}
    for spill in (1, 2):
        ivf = IvfIndex(k=64)
        ivf.build_arrays(range(8192), x, seed=0, iters=15, spill=spill)
        _, ids = ivf.search_batch(q, n_probe=4, top_k=10)
        recs[spill] = recall(ids)
        # spilled copies must never surface as duplicate ids
        assert all(
            len(set(ids[i][ids[i] >= 0].tolist()))
            == int((ids[i] >= 0).sum()) for i in range(64)
        )
    assert recs[2] > recs[1]


def test_rp_add_after_enable():
    from vector_db_tpu.types import Node

    x = _corpus(n=512, dim=32, seed=3)
    ivf = IvfIndex(k=8)
    ivf.build_arrays(range(len(x)), x, seed=1, iters=10, spill=2)
    ivf.enable_rp(dims=16)
    rng = np.random.default_rng(9)
    v = x[7] + rng.standard_normal(32).astype(np.float32)
    ivf.add(Node(id=10_000, embedding=v.tolist(), metadata={}))
    d, ids = ivf.search_batch(v[None, :], n_probe=8, top_k=1, rp=True)
    assert ids[0, 0] == 10_000
    assert d[0, 0] < 0.5


def test_residual_pq_rejects_spill():
    x = _corpus(n=512, dim=32, seed=5)
    ivf = IvfIndex(k=8)
    ivf.build_arrays(range(len(x)), x, seed=1, iters=10, spill=2)
    with pytest.raises(ValueError, match="spill"):
        ivf.enable_pq(chunks=4, ksub=32, residual=True)
    ivf.enable_pq(chunks=4, ksub=32, residual=False)  # raw PQ is fine


def test_rp_scan_mode_full_probe():
    """n_probe >= k routes to the tiled full-scan kernel (probe ceiling
    1.0 by construction) and must match exact search after rerank."""
    data = _lowrank_corpus(4096 + 32, seed=7)
    x, q = data[:4096], data[4096:]
    gt = np.argsort(((x[None, :, :] - q[:, None, :]) ** 2).sum(-1),
                    axis=1)[:, :10]
    for spill in (1, 2):
        ivf = IvfIndex(k=32)
        ivf.build_arrays(range(4096), x, seed=0, iters=15, spill=spill)
        ivf.enable_rp(dims=16)
        _, ids = ivf.search_batch(q, n_probe=32, top_k=10, rp=True,
                                  fetch=64)
        rec = np.mean([len(set(ids[i].tolist()) & set(gt[i].tolist())) / 10
                       for i in range(32)])
        assert rec >= 0.97, (spill, rec)
        # no duplicate ids even with spilled copies
        assert all(
            len(set(ids[i][ids[i] >= 0].tolist()))
            == int((ids[i] >= 0).sum()) for i in range(32)
        )


def test_pq_scan_mode_full_probe():
    """n_probe >= k routes residual ADC through the one-hot-matmul scan
    kernel; with exact rerank it must match the gather probe kernel."""
    x = _corpus(n=4096, dim=64, seed=13)
    q = _corpus(n=32, dim=64, seed=14)
    gt = np.argsort(((x[None, :, :] - q[:, None, :]) ** 2).sum(-1),
                    axis=1)[:, :10]
    ivf = IvfIndex(k=32)
    ivf.build_arrays(range(4096), x, seed=0, iters=15)
    ivf.enable_pq(chunks=8, ksub=64, residual=True)
    _, ids_scan = ivf.search_batch(q, n_probe=32, top_k=10, pq=True,
                                   fetch=128)
    _, ids_probe = ivf.search_batch(q, n_probe=31, top_k=10, pq=True,
                                    fetch=128)

    def rec(ids):
        return np.mean([len(set(ids[i].tolist()) & set(gt[i].tolist())) / 10
                        for i in range(32)])

    assert rec(ids_scan) >= rec(ids_probe) - 0.02
    assert rec(ids_scan) >= 0.9  # rerank recovers ADC coarseness


def test_persistence_restores_rp_and_pq(tmp_path):
    """save_index/load_index round-trips the trained projection and PQ
    codebooks: a reopened index serves rp/pq searches with NO retraining
    (mirrors/codes regenerate from storage in streaming device programs).
    Reference persistence is lists+centroids only (ivf.py:210-241)."""
    from vector_db_tpu.storage import InMemoryNodeStorage
    from vector_db_tpu.types import Node

    x = _corpus(n=2048, dim=32, seed=31)
    storage = InMemoryNodeStorage()
    path = tmp_path / "ivf.npz"
    ivf = IvfIndex(k=16, storage=storage, index_file=path)
    ivf.autosave = False
    for i in range(2048):
        storage.save(Node(id=i, embedding=x[i], metadata={}))
    ivf.build_arrays(range(2048), x, seed=0, iters=10)
    ivf.enable_pq(chunks=4, ksub=32, residual=True, opq_iters=2)
    ivf.enable_rp(dims=16)
    ivf.save_index()

    q = x[:16] + 0.01
    _, want_pq = ivf.search_batch(q, n_probe=8, top_k=5, pq=True)
    _, want_rp = ivf.search_batch(q, n_probe=8, top_k=5, rp=True)

    ivf2 = IvfIndex(k=16, storage=storage, index_file=path)
    assert getattr(ivf2, "_pq", None) is not None
    assert getattr(ivf2, "_rp_proj", None) is not None
    _, got_pq = ivf2.search_batch(q, n_probe=8, top_k=5, pq=True)
    _, got_rp = ivf2.search_batch(q, n_probe=8, top_k=5, rp=True)
    # same codebooks + same corpus -> identical candidates
    assert np.array_equal(want_pq, got_pq)
    assert np.array_equal(want_rp, got_rp)
