"""Grouped (batch-parallel) edge commit vs the sequential fold.

The grouped commit (hnsw_kernels.commit_inserts_grouped) must produce the
same graph as the sequential item-at-a-time commit: identical edge SETS per
(node, level) row (order within a row is top-k tie-order and carries no
meaning), identical levels and entry election.
"""

import random

import numpy as np
import pytest

from vector_db_tpu.index.hnsw import HNSW
from vector_db_tpu.types import Node


def build(rng_seed, nodes, mode, batch_size):
    index = HNSW(M=4, ef_construction=24, rng=random.Random(rng_seed))
    index.commit_mode = mode
    index.insert_nodes(nodes, batch_size=batch_size)
    return index


def rows_of(index):
    """{(slot, level): frozenset(neighbors)} for live slots."""
    from vector_db_tpu.index import hnsw_kernels as K

    table = np.asarray(index.graph.neighbors)
    levels = np.asarray(index.graph.levels)
    out = {}
    for slot in np.nonzero(levels >= 0)[0]:
        for lvl in range(levels[slot] + 1):
            start = K.level_col_start(lvl, index.M)
            width = K.level_width(lvl, index.M)
            row = table[slot, start:start + width]
            out[(int(slot), lvl)] = frozenset(int(x) for x in row if x >= 0)
    return out


@pytest.mark.parametrize("batch_size", [1, 7, 32])
def test_grouped_matches_sequential(rng, batch_size):
    nodes = [Node(id=i, embedding=rng.standard_normal(12).astype(np.float32))
             for i in range(64)]
    a = build(42, nodes, "sequential", batch_size)
    b = build(42, nodes, "grouped", batch_size)
    assert int(a.graph.entry) == int(b.graph.entry)
    assert int(a.graph.entry_level) == int(b.graph.entry_level)
    np.testing.assert_array_equal(
        np.asarray(a.graph.levels), np.asarray(b.graph.levels)
    )
    ra, rb = rows_of(a), rows_of(b)
    assert ra.keys() == rb.keys()
    diff = {k for k in ra if ra[k] != rb[k]}
    # distances on random data are distinct, so sets must match exactly
    assert not diff, f"{len(diff)} rows differ, e.g. {sorted(diff)[:5]}"


def test_grouped_recall_and_connectivity(rng):
    nodes = [Node(id=i, embedding=rng.standard_normal(16).astype(np.float32))
             for i in range(200)]
    index = build(42, nodes, "grouped", 64)
    # recall vs brute force (reference contract shape)
    ok = 0
    for _ in range(10):
        q = rng.standard_normal(16).astype(np.float32)
        got = {n.id for n, _ in index.search(q, k=5, ef=50)}
        d = np.array([np.linalg.norm(q - n.embedding) for n in nodes])
        want = {nodes[i].id for i in np.argsort(d)[:5]}
        if len(got & want) / 5 >= 0.7:
            ok += 1
    assert ok >= 8
    # level-0 BFS connectivity >= 90%
    from collections import deque

    adj = rows_of(index)
    start = int(index.graph.entry)
    seen = {start}
    dq = deque([start])
    while dq:
        cur = dq.popleft()
        for nb in adj.get((cur, 0), ()):
            if nb not in seen:
                seen.add(nb)
                dq.append(nb)
    assert len(seen) >= 0.9 * len(nodes)


def test_grouped_empty_graph_bootstrap(rng):
    """First batch into an empty graph: entry elected, edges form among
    batch members."""
    nodes = [Node(id=i, embedding=rng.standard_normal(8).astype(np.float32))
             for i in range(20)]
    index = build(42, nodes, "grouped", 32)
    assert index.graph is not None and int(index.graph.entry) >= 0
    res = index.search(nodes[3].embedding, k=1, ef=20)
    assert res[0][0].id == 3
    # every non-entry node has at least one level-0 edge
    r = rows_of(index)
    empties = [k for k, v in r.items() if k[1] == 0 and not v]
    assert len(empties) <= 1
