"""Randomized add/delete/search sequences against a naive reference.

The reference IvfIndex's contract (src/vector_db/indexing/ivf.py:98-214):
after any mutation sequence, probing all cells returns exactly the
brute-force nearest neighbors of the live set. Exercises slot reuse,
spill bookkeeping, incremental PQ/RP row maintenance and dedup together.
"""

import numpy as np
import pytest

from vector_db_tpu.index.ivf import IvfIndex
from vector_db_tpu.types import Node


@pytest.mark.parametrize("spill,mode", [(1, "exact"), (2, "exact"),
                                        (1, "pq"), (2, "rp")])
def test_mutation_sequences_match_bruteforce(spill, mode):
    rng = np.random.default_rng(1234 + spill + len(mode))
    dim, k_cells = 24, 8
    base = rng.standard_normal((256, dim)).astype(np.float32) * 2

    ivf = IvfIndex(k=k_cells)
    ivf.build_arrays(range(256), base, seed=0, iters=8, spill=spill)
    live = {i: base[i] for i in range(256)}
    if mode == "pq":
        if spill > 1:
            pytest.skip("residual PQ rejects spilled indexes")
        ivf.enable_pq(chunks=4, ksub=32, residual=True)
    elif mode == "rp":
        ivf.enable_rp(dims=dim)  # full dims: projection lossless

    next_id = 1000
    for step in range(6):
        op = rng.integers(0, 4)
        if op == 0:  # add a few
            for _ in range(int(rng.integers(1, 4))):
                v = rng.standard_normal(dim).astype(np.float32) * 2
                ivf.add(Node(id=next_id, embedding=v, metadata={}))
                live[next_id] = v
                next_id += 1
        elif op == 1 and len(live) > 16:  # delete a few
            for nid in rng.choice(list(live), size=3, replace=False):
                ivf.delete(int(nid))
                live.pop(int(nid))
        elif op == 3:  # re-enable aux state mid-sequence: retrains the
            # codebooks/projection and re-encodes EVERY live row
            # (including post-build adds — the residual re-encode path)
            if mode == "pq":
                ivf.enable_pq(chunks=4, ksub=32, residual=True)
            elif mode == "rp":
                ivf.enable_rp(dims=dim)

        # full-probe search == brute force over the live set
        q = rng.standard_normal((4, dim)).astype(np.float32) * 2
        kwargs = {}
        if mode == "pq":
            kwargs = {"pq": True, "fetch": 128}
        elif mode == "rp":
            kwargs = {"rp": True, "fetch": 128}
        _, ids = ivf.search_batch(q, n_probe=k_cells, top_k=5, **kwargs)
        ids_all = np.asarray(sorted(live))
        mat = np.stack([live[int(i)] for i in ids_all])
        d = ((q[:, None, :] - mat[None, :, :]) ** 2).sum(-1)
        want = ids_all[np.argsort(d, axis=1)[:, :5]]
        for r in range(4):
            got = set(int(x) for x in ids[r] if x >= 0)
            expect = set(int(x) for x in want[r])
            # exact/rp(full-dims) must match; pq rerank can drop ties
            overlap = len(got & expect) / 5
            assert overlap >= (1.0 if mode != "pq" else 0.8), (
                step, r, got, expect)
