#!/usr/bin/env python
"""Phase attribution for the tiered service ingest (VERDICT r3 #5).

BENCH_TIERED r4 re-measure still showed ~202 vps (target >=1000) after
the save_many batching fix, so the bottleneck moved — this attributes
each service batch at 100k scale into:

  - engine insert (construction search + edge commit device programs)
  - storage save_many (host memmap writes)
  - flush save_index, split into device->host table pull vs npz write

Env: EXP_N (40000), EXP_DIM (384), EXP_BATCH (5000), EXP_OUT.
"""

import json
import os
import sys
import time
from pathlib import Path

import random

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from vector_db_tpu.datasets import embedding_like
    from vector_db_tpu.index.hnsw import HNSW
    from vector_db_tpu.storage.mmap import MMapNodeStorage
    from vector_db_tpu.types import Node

    N = int(os.environ.get("EXP_N", 40_000))
    DIM = int(os.environ.get("EXP_DIM", 384))
    BATCH = int(os.environ.get("EXP_BATCH", 5000))

    work = Path("/tmp/tiered_profile")
    work.mkdir(exist_ok=True)
    for f in work.glob("vdb*"):
        f.unlink()

    x = embedding_like(N, DIM, 0)
    storage = MMapNodeStorage(work / "vdb_emb.dat", work / "vdb_meta.dat",
                              dim=DIM, capacity=N + BATCH)
    # default growable capacity (power-of-two doubling) — same path the
    # service takes; an explicit odd capacity breaks the tile invariant
    index = HNSW(M=16, ef_construction=200, rng=random.Random(42),
                 storage=storage, index_file=work / "vdb_index.npz")

    rows = []
    for s in range(0, N, BATCH):
        e = min(N, s + BATCH)
        nodes = [Node(id=i, embedding=x[i], metadata={}) for i in range(s, e)]
        t0 = time.perf_counter()
        storage.save_many(nodes)
        t_store = time.perf_counter() - t0

        t0 = time.perf_counter()
        ids = [n.id for n in nodes]
        index._ensure_init(DIM)
        for i in range(0, len(nodes), 1024):
            index._insert_rows(
                ids[i:i + 1024], x[s + i:min(e, s + i + 1024)])
        jax.block_until_ready(index.graph.neighbors)
        t_insert = time.perf_counter() - t0

        # flush, split: device pull vs host npz write
        t0 = time.perf_counter()
        host_tabs = {
            "neighbors": np.asarray(index.graph.neighbors),
            "levels": np.asarray(index.graph.levels),
        }
        t_pull = time.perf_counter() - t0
        t0 = time.perf_counter()
        index.save_index()
        t_save_full = time.perf_counter() - t0

        row = {"size": e, "store_s": round(t_store, 3),
               "insert_s": round(t_insert, 3),
               "insert_vps": round(BATCH / t_insert),
               "pull_s": round(t_pull, 3),
               "save_index_s": round(t_save_full, 3),
               "batch_total_s": round(
                   t_store + t_insert + t_save_full, 3)}
        rows.append(row)
        log(json.dumps(row))

    nb = index.graph.neighbors
    out = {"N": N, "dim": DIM, "batch": BATCH,
           "neighbors_shape": list(nb.shape),
           "neighbors_mb": round(nb.size * 4 / 1e6, 1),
           "rows": rows}
    Path(os.environ.get("EXP_OUT", "EXP_TIERED_PROFILE.json")).write_text(
        json.dumps(out, indent=2))
    log("wrote EXP_TIERED_PROFILE.json")


if __name__ == "__main__":
    main()
