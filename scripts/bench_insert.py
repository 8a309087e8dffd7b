#!/usr/bin/env python
"""Streaming-insert throughput: batched beam-search inserts into a live
HNSW index (the reference's insert path runs 66-139 vec/s on CPU).

Measures both edge-commit strategies — "sequential" (item-at-a-time
fori_loop, the round-1 path) and "grouped" (batch-parallel sort/segment
commit, round 2) — warm, at several batch sizes. Writes BENCH_INSERT.json.
"""

import json
import random
import sys
import time
from pathlib import Path

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

    DIM = 384
    BASE = 10_000
    batches = [1024, 4096]
    modes = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "grouped", "sequential"
    ]
    STREAM = 2 * sum(batches) * len(modes) + len(modes)
    x = embedding_like(BASE + STREAM, DIM, 0)

    index = HNSW(M=16, ef_construction=200, rng=random.Random(42),
                 capacity=BASE + STREAM, l_max=5)
    index.bulk_build(list(range(BASE)), x[:BASE])
    jax.block_until_ready(index.graph.neighbors)
    log(f"base index: {BASE}")

    results = {}
    offset = BASE
    for mode in modes:
        index.commit_mode = mode
        # warm the insert kernels with one bucketed batch
        index.insert_arrays([offset], x[offset:offset + 1])
        jax.block_until_ready(index.graph.neighbors)
        offset += 1
        for bs in batches:
            for phase in ("cold", "warm"):
                n = bs
                ids = list(range(offset, offset + n))
                t0 = time.perf_counter()
                index.insert_arrays(ids, x[offset:offset + n], batch_size=bs)
                jax.block_until_ready(index.graph.neighbors)
                el = time.perf_counter() - t0
                offset += n
                if phase == "warm":
                    log(f"{mode} batch={bs}: {n / el:.0f} vec/s warm")
                    results[f"{mode}_batch_{bs}_vps"] = n / el
                else:
                    log(f"{mode} batch={bs}: {n / el:.0f} vec/s "
                        "(first run, incl. compile)")

    results["corpus_after"] = index.size
    results["note"] = (
        "warm rates; reference CPU insert: 66-139 vec/s. grouped = "
        "batch-parallel commit (sort/segment backlink merge), sequential = "
        "item-at-a-time fori_loop."
    )
    Path("BENCH_INSERT.json").write_text(json.dumps(results, indent=2))
    log(json.dumps(results))


if __name__ == "__main__":
    main()
