#!/usr/bin/env python
"""1M x 768-d flagship benchmark (BASELINE.md config 4): bulk build,
exact / HNSW / HNSW-over-PQ search QPS + recall on one chip.
Writes BENCH_1M.json; all progress to stderr."""

import json
import random
import sys
import time
from pathlib import Path

import numpy as np

# allow running as `python scripts/<name>.py` without PYTHONPATH
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def synth(n, dim, seed, intrinsic=64):
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((n, intrinsic)).astype(np.float32)
    v = rng.standard_normal((intrinsic, dim)).astype(np.float32) / np.sqrt(intrinsic)
    x = u @ v
    for s in range(0, n, 100_000):
        e = min(s + 100_000, n)
        x[s:e] += 0.05 * rng.standard_normal((e - s, dim)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vector_db_tpu.index.hnsw import HNSW
    from vector_db_tpu.ops.exact import exact_search_tiled

    N, DIM, B, K = 1_000_000, 768, 1000, 10
    log(f"generating {N}x{DIM}...")
    t0 = time.perf_counter()
    data = synth(N + B, DIM, 0)
    x, q = data[:N], data[N:]
    log(f"data {time.perf_counter()-t0:.0f}s")

    t0 = time.perf_counter()
    index = HNSW(M=16, ef_construction=200, rng=random.Random(42),
                 capacity=N, l_max=5)
    index.bulk_build(list(range(N)), x)
    jax.block_until_ready(index.graph.neighbors)
    build_s = time.perf_counter() - t0
    log(f"build: {build_s:.0f}s = {N/build_s:.0f} vec/s")

    qd = jnp.asarray(q)
    t0 = time.perf_counter()
    gt = np.asarray(
        exact_search_tiled(qd, index._emb, index._has_emb, K, tile=31250)[1]
    )
    log(f"exact gt: {time.perf_counter()-t0:.1f}s")
    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        # vary inputs per rep: remote backends can memoize identical runs
        d, _ = exact_search_tiled(qd * (1.0 + (r + 1) * 1e-6), index._emb,
                                  index._has_emb, K, tile=31250)
        jax.block_until_ready(d)
    exact_qps = reps * B / (time.perf_counter() - t0)
    log(f"exact qps: {exact_qps:.0f}")

    results = {"N": N, "dim": DIM, "build_s": build_s,
               "build_vps": N / build_s, "exact_qps": exact_qps,
               "hnsw": [], "hnsw_pq": []}

    for ef in [200, 400]:
        _, ids = index.search_batch(q, k=K, ef=ef, expand=4)
        t0 = time.perf_counter()
        index.search_batch(q * (1.0 + 1e-6), k=K, ef=ef, expand=4)
        el = time.perf_counter() - t0
        rec = float(np.mean(
            [len(set(ids[i]) & set(gt[i])) / K for i in range(B)]
        ))
        log(f"hnsw ef={ef}: recall={rec:.3f} qps={B/el:.0f}")
        results["hnsw"].append({"ef": ef, "recall": rec, "qps": B / el})

    t0 = time.perf_counter()
    index.enable_pq(chunks=16, ksub=256)
    log(f"enable_pq: {time.perf_counter()-t0:.0f}s")
    for ef in [200, 400]:
        _, ids = index.search_batch_pq(q, k=K, ef=ef, expand=4)
        t0 = time.perf_counter()
        index.search_batch_pq(q * (1.0 + 1e-6), k=K, ef=ef, expand=4)
        el = time.perf_counter() - t0
        rec = float(np.mean(
            [len(set(ids[i]) & set(gt[i])) / K for i in range(B)]
        ))
        log(f"hnsw-pq ef={ef}: recall={rec:.3f} qps={B/el:.0f}")
        results["hnsw_pq"].append({"ef": ef, "recall": rec, "qps": B / el})

    Path("BENCH_1M.json").write_text(json.dumps(results, indent=2))
    log("done")


if __name__ == "__main__":
    main()
