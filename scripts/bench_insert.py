#!/usr/bin/env python
"""Streaming-insert throughput: batched beam-search inserts into a live
HNSW index (the reference's insert path runs 66-139 vec/s on CPU).
Writes BENCH_INSERT.json."""

import json
import random
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def synth(n, dim, seed, intrinsic=64):
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((n, intrinsic)).astype(np.float32)
    v = rng.standard_normal((intrinsic, dim)).astype(np.float32) / np.sqrt(intrinsic)
    x = u @ v + 0.05 * rng.standard_normal((n, dim)).astype(np.float32)
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from vector_db_tpu.index.hnsw import HNSW

    DIM = 384
    BASE, STREAM = 10_000, 8_192
    x = synth(BASE + STREAM, DIM, 0)

    index = HNSW(M=16, ef_construction=200, rng=random.Random(42),
                 capacity=BASE + STREAM, l_max=5)
    index.bulk_build(list(range(BASE)), x[:BASE])
    jax.block_until_ready(index.graph.neighbors)
    log(f"base index: {BASE}")

    # warm the insert kernels with one bucketed batch
    index.insert_arrays([BASE], x[BASE:BASE + 1])
    jax.block_until_ready(index.graph.neighbors)

    results = {}
    offset = BASE + 1
    for bs in [256, 1024, 4096]:
        n = min(bs * 2, BASE + STREAM - offset)
        if n < bs:
            break
        ids = list(range(offset, offset + n))
        t0 = time.perf_counter()
        index.insert_arrays(ids, x[offset:offset + n], batch_size=bs)
        jax.block_until_ready(index.graph.neighbors)
        el = time.perf_counter() - t0
        # second run at same batch size is the warm number
        log(f"batch={bs}: {n/el:.0f} vec/s (first incl. compile)")
        results[f"batch_{bs}_vps"] = n / el
        offset += n

    results["corpus_after"] = index.size
    Path("BENCH_INSERT.json").write_text(json.dumps(results, indent=2))
    log("done")


if __name__ == "__main__":
    main()
