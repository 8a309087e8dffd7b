"""bf16 traversal precision: beam expansion gathers from a bfloat16
mirror (half HBM traffic), final distances re-scored exactly from f32."""

import random

import numpy as np

from vector_db_tpu.index.hnsw import HNSW


def test_bf16_traversal_matches_f32(rng):
    x = rng.standard_normal((600, 32)).astype(np.float32) * 2
    a = HNSW(M=8, ef_construction=60, rng=random.Random(1), capacity=1024)
    b = HNSW(M=8, ef_construction=60, rng=random.Random(1), capacity=1024,
             precision="bf16")
    a.bulk_build(list(range(600)), x)
    b.bulk_build(list(range(600)), x)

    q = x[:32] + 0.01
    da, ia = a.search_batch(q, k=5, ef=80)
    db, ib = b.search_batch(q, k=5, ef=80)
    # same graphs, bf16 only perturbs candidate selection marginally
    agree = np.mean([
        len(set(ia[i].tolist()) & set(ib[i].tolist())) / 5
        for i in range(32)
    ])
    assert agree >= 0.9
    # reported distances are exact f32 (rescored): self-queries at 0
    db0, ib0 = b.search_batch(x[:4], k=1, ef=60)
    np.testing.assert_array_equal(ib0[:, 0], [0, 1, 2, 3])
    assert np.all(db0[:, 0] < 1e-2)


def test_bf16_mirror_invalidates_on_insert(rng):
    x = rng.standard_normal((300, 16)).astype(np.float32)
    idx = HNSW(M=4, ef_construction=40, rng=random.Random(2),
               capacity=1024, precision="bf16")
    idx.bulk_build(list(range(300)), x)
    _ = idx.search_batch(x[:1], k=1, ef=40)  # builds the mirror
    v = rng.standard_normal((1, 16)).astype(np.float32)
    idx.insert_arrays([999], v)
    _, ids = idx.search_batch(v, k=1, ef=40)
    assert ids[0, 0] == 999  # mirror rebuilt: new row visible to the beam
