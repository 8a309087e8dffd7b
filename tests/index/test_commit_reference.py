"""Property-based check: the device edge-commit fold (commit_inserts)
must match a pure-Python transcription of the reference's insert fold
(reference hnsw.py:136-213 — connect M closest, append-or-prune
backlinks) given identical candidate sets, across random graphs, batch
sizes, levels, and hyperparameters.

The search phase is NOT under test here (its contract is recall);
the commit fold IS exact bookkeeping and must be bit-faithful.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from vector_db_tpu.index import hnsw_kernels as K
from vector_db_tpu.ops.distance import BIG


def py_dist(emb, a, b):
    d = emb[a] - emb[b]
    return float(np.dot(d, d))


def py_commit(neighbors, levels, entry, entry_level, emb, has_emb,
              new_slots, new_levels, cand_d, cand_s, batch_d, M, l_max,
              efc):
    """Pure-Python reference commit fold (mirrors reference hnsw.py
    insert: select M closest of the candidate set per level, write the
    forward row, append-or-prune each selected neighbor's backlink)."""
    B = len(new_slots)
    cap = neighbors.shape[0]
    for i in range(B):
        slot = int(new_slots[i])
        if slot < 0 or levels[slot] >= 0:
            continue
        lvl = int(new_levels[i])
        is_first = entry < 0
        if not is_first:
            for level in range(min(lvl, l_max - 1) + 1):
                start = K.level_col_start(level, M)
                width = K.level_width(level, M)
                # merge precomputed candidates with earlier batch members
                pool = []
                for d, s in zip(cand_d[i, level], cand_s[i, level]):
                    if s >= 0 and d < BIG / 2:
                        pool.append((float(d), int(s)))
                for j in range(i):
                    if new_slots[j] >= 0 and new_levels[j] >= level:
                        pool.append((float(batch_d[i, j]),
                                     int(new_slots[j])))
                pool.sort()
                pool = pool[:efc]
                sel = [s for _, s in pool[:M]]
                # forward edges
                neighbors[slot, start:start + width] = -1
                neighbors[slot, start:start + len(sel)] = sel
                # backlinks: batched read-then-write (selected slots are
                # unique, so this equals the sequential fold)
                new_rows = {}
                for n in sel:
                    row = list(neighbors[n, start:start + width])
                    if -1 in row:
                        row[row.index(-1)] = slot
                        new_rows[n] = row
                    else:
                        cands = row + [slot]
                        dd = [
                            py_dist(emb, n, c)
                            if c >= 0 and has_emb[c] else float(BIG)
                            for c in cands
                        ]
                        order = np.argsort(
                            np.asarray(dd, np.float32), kind="stable"
                        )[:width]
                        new_rows[n] = [
                            cands[o] if dd[o] < BIG / 2 else -1
                            for o in order
                        ]
                for n, row in new_rows.items():
                    neighbors[n, start:start + width] = row
        levels[slot] = lvl
        if is_first or lvl > entry_level:
            entry, entry_level = slot, lvl
    return neighbors, levels, entry, entry_level


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("M,l_max,batch", [(4, 3, 7), (8, 2, 5)])
def test_commit_matches_python_reference(seed, M, l_max, batch):
    rng = np.random.default_rng(seed)
    pyr = random.Random(seed)
    dim, cap, efc = 8, 64, 12
    n0 = 20  # pre-existing graph size

    emb_np = rng.standard_normal((cap, dim)).astype(np.float32)
    has_np = np.zeros(cap, bool)
    has_np[: n0 + batch] = True
    emb = jnp.asarray(emb_np)
    has_emb = jnp.asarray(has_np)

    # seed graph: commit n0 nodes through the kernel first
    ncols = K.ncols(M, l_max)
    graph = K.Graph(
        neighbors=jnp.full((cap, ncols), -1, jnp.int32),
        levels=jnp.full((cap,), -1, jnp.int32),
        entry=jnp.int32(-1),
        entry_level=jnp.int32(-1),
    )
    lvl0 = np.asarray(
        [min(int(-np.log(pyr.random()) / np.log(M)), l_max - 1)
         for _ in range(n0)], np.int32)
    slots0 = np.arange(n0, dtype=np.int32)
    cd0, cs0 = K.construction_search(
        graph, emb, has_emb, emb[:n0], jnp.asarray(lvl0),
        M=M, l_max=l_max, ef_construction=efc, max_steps=2 * efc + 16,
    )
    bd0 = np.asarray(
        ((emb_np[:n0, None] - emb_np[None, :n0]) ** 2).sum(-1), np.float32)
    graph = K.commit_inserts(
        graph, emb, has_emb, jnp.asarray(slots0), jnp.asarray(lvl0),
        cd0, cs0, jnp.asarray(bd0), M=M, l_max=l_max, ef_construction=efc,
    )

    # the batch under test
    slots = np.arange(n0, n0 + batch, dtype=np.int32)
    lvls = np.asarray(
        [min(int(-np.log(pyr.random()) / np.log(M)), l_max - 1)
         for _ in range(batch)], np.int32)
    new_emb = emb[n0 : n0 + batch]
    cd, cs = K.construction_search(
        graph, emb, has_emb, new_emb, jnp.asarray(lvls),
        M=M, l_max=l_max, ef_construction=efc, max_steps=2 * efc + 16,
    )
    bd = np.asarray(
        ((emb_np[n0:n0 + batch, None] - emb_np[None, n0:n0 + batch]) ** 2
         ).sum(-1), np.float32)

    # snapshot BEFORE the kernel call: commit_inserts donates the graph
    pre_n = np.asarray(graph.neighbors).copy()
    pre_l = np.asarray(graph.levels).copy()
    pre_e, pre_el = int(graph.entry), int(graph.entry_level)
    cd_np, cs_np = np.asarray(cd), np.asarray(cs)

    got = K.commit_inserts(
        graph, emb, has_emb, jnp.asarray(slots), jnp.asarray(lvls),
        cd, cs, jnp.asarray(bd), M=M, l_max=l_max, ef_construction=efc,
    )

    want_n, want_l, want_e, want_el = py_commit(
        pre_n, pre_l, pre_e, pre_el,
        emb_np, has_np, slots, lvls,
        cd_np, cs_np, bd, M, l_max, efc,
    )

    np.testing.assert_array_equal(np.asarray(got.levels), want_l)
    assert int(got.entry) == want_e
    assert int(got.entry_level) == want_el
    np.testing.assert_array_equal(np.asarray(got.neighbors), want_n)
