#!/usr/bin/env python
"""Headline benchmark: query throughput at recall@10 >= 0.95, one chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": <QPS at recall@10>=0.95 on 1M x 768-d>,
   "unit": "qps", "vs_baseline": <ours / reference, matched corpus>}

The engine serves a recall target with whichever index mode is fastest at
that target. On TPU the fused matmul+top-k exact path IS the fastest mode
at these scales (recall 1.0 at MXU speed — ~9k QPS on 1M x 768-d, ~39k on
10k x 384-d), so the headline value is exact-mode QPS at the north-star
corpus (BASELINE.json: 1M x 768-d, recall@10 >= 0.95). HNSW numbers are
measured alongside and recorded in BENCH_DETAILS.json (config 1/2 style).

vs_baseline is a matched head-to-head: the reference (pure-Python HNSW on
CPU — its only search path) and this engine run on the SAME corpus
(BENCH_REF_N vectors), each tuned to its fastest mode reaching recall@10 >=
0.95 against exact ground truth; the ratio compares those operating points.

Data: synthetic "embedding-like" vectors — low intrinsic dimension (rank-64
mixing + noise, L2-normalized), matching the structure of real sentence-
embedding corpora (the reference's default all-MiniLM-L6-v2 is 384-d
L2-normalized; BASELINE.md config 1).

Env knobs:
  BENCH_N          corpus for the HNSW detail numbers (default 100000)
  BENCH_HEADLINE_N corpus for the headline exact number (default 1000000)
  BENCH_REF_N      corpus size for the head-to-head (default 10000)
  BENCH_QUERIES    query batch (default 1000)
  BENCH_SKIP_REF   "1" = reuse cached reference measurement only
  BENCH_REF_CACHE  path of the reference-measurement cache JSON

All diagnostics go to stderr; details are written to BENCH_DETAILS.json.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time
from pathlib import Path

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def synth_embeddings(n: int, dim: int, seed: int, intrinsic: int = 64) -> np.ndarray:
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((n, intrinsic)).astype(np.float32)
    v = rng.standard_normal((intrinsic, dim)).astype(np.float32) / np.sqrt(intrinsic)
    x = u @ v + 0.05 * rng.standard_normal((n, dim)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def recall_at_k(ids: np.ndarray, gt: np.ndarray, k: int) -> float:
    return float(
        np.mean([len(set(ids[i][:k]) & set(gt[i][:k])) / k
                 for i in range(len(gt))])
    )


EF_SWEEP = [100, 150, 200, 300, 400, 600]


def bench_ours(x: np.ndarray, q: np.ndarray, k: int, target: float):
    """Build + tune + measure this engine. Returns dict of results."""
    import jax
    import jax.numpy as jnp

    from vector_db_tpu.index import hnsw_kernels as K
    from vector_db_tpu.index.hnsw import HNSW
    from vector_db_tpu.ops.exact import exact_search_tiled

    n = x.shape[0]
    t0 = time.perf_counter()
    index = HNSW(M=16, ef_construction=200, rng=random.Random(42),
                 capacity=n, l_max=5)
    index.bulk_build(list(range(n)), x)
    jax.block_until_ready(index.graph.neighbors)
    build_s = time.perf_counter() - t0

    qd = jnp.asarray(q)
    gt = np.asarray(
        exact_search_tiled(qd, index._emb, index._has_emb, k, tile=25088)[1]
    )

    # exact-path throughput (recall 1.0 by construction). NOTE: every
    # timed repetition perturbs the queries — some remote backends memoize
    # identical (executable, input) executions, which inflates identical-
    # repeat timings severalfold.
    def run_exact(qv):
        d, i = exact_search_tiled(qv, index._emb, index._has_emb, k,
                                  tile=25088)
        jax.block_until_ready(d)

    run_exact(qd)
    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        run_exact(qd * (1.0 + (r + 1) * 1e-6))
    exact_qps = reps * len(q) / (time.perf_counter() - t0)

    chosen = None
    for ef in EF_SWEEP:
        ms = 2 * ef + 16

        def run(qv):
            d, s = K.search_batch(
                index.graph, index._emb, index._has_emb, qv, None,
                M=16, l_max=5, ef=ef, k=k, max_steps=ms,
                use_filter=False, pool=ef, expand=4,
            )
            jax.block_until_ready(d)
            return np.asarray(s)

        slots = run(qd)  # compile + warm
        reps = 2
        t0 = time.perf_counter()
        for r in range(reps):
            run(qd * (1.0 + (r + 1) * 1e-6))
        qps = reps * len(q) / (time.perf_counter() - t0)
        rec = recall_at_k(slots, gt, k)
        log(f"  ours n={n} ef={ef}: recall@{k}={rec:.3f} qps={qps:.0f}")
        chosen = {"ef": ef, "recall": rec, "qps": qps}
        if rec >= target:
            break
    chosen["build_s"] = build_s
    chosen["build_vps"] = n / build_s
    chosen["exact_qps"] = exact_qps
    return chosen


def bench_reference(x: np.ndarray, q: np.ndarray, k: int, target: float,
                    cache_path: Path, skip: bool):
    """Measure the reference HNSW (pure Python, CPU) at the same config."""
    key = f"n{x.shape[0]}_d{x.shape[1]}_M16_efc200_q{len(q)}"
    if cache_path.exists():
        cached = json.loads(cache_path.read_text())
        if cached.get("key") == key:
            log(f"  reference: using cached measurement {cached}")
            return cached
    if skip:
        log("  reference: no cache and BENCH_SKIP_REF=1 -> vs_baseline null")
        return None

    sys.path.insert(0, "/root/reference/src")
    from vector_db.indexing.hnsw import HNSW as RefHNSW  # noqa: E402
    from vector_db.types import Node as RefNode  # noqa: E402

    n = x.shape[0]
    d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d, axis=1)[:, :k]

    t0 = time.perf_counter()
    ref = RefHNSW(M=16, ef_construction=200, rng=random.Random(42))
    for i in range(n):
        ref.insert_node(RefNode(id=i, embedding=x[i], metadata={}, content=None))
        if i and i % 2000 == 0:
            log(f"  reference build {i}/{n} "
                f"({i / (time.perf_counter() - t0):.0f} vec/s)")
    build_s = time.perf_counter() - t0

    result = None
    for ef in EF_SWEEP:
        t0 = time.perf_counter()
        all_ids = []
        for qi in range(len(q)):
            res = ref.search(q[qi], k=k, ef=ef)
            all_ids.append([node.id for node, _ in res])
        el = time.perf_counter() - t0
        rec = float(np.mean(
            [len(set(all_ids[i]) & set(gt[i])) / k for i in range(len(q))]
        ))
        qps = len(q) / el
        log(f"  reference ef={ef}: recall@{k}={rec:.3f} qps={qps:.0f}")
        result = {"key": key, "ef": ef, "recall": rec, "qps": qps,
                  "build_s": build_s, "build_vps": n / build_s}
        if rec >= target:
            break
    cache_path.write_text(json.dumps(result))
    return result


def bench_exact_headline(n: int, dim: int, n_q: int, k: int):
    """Exact-mode QPS at the north-star corpus shape (recall 1.0 by
    construction)."""
    import jax
    import jax.numpy as jnp

    from vector_db_tpu.ops.exact import exact_search_tiled

    log(f"generating {n}x{dim} headline corpus...")
    data = synth_embeddings(n + n_q, dim, seed=1, intrinsic=64)
    x = jnp.asarray(data[:n])
    q = jnp.asarray(data[n:])
    valid = jnp.ones((n,), bool)
    tile = 31250 if n % 31250 == 0 else 25000

    def run(qv):
        d, i = exact_search_tiled(qv, x, valid, k, tile=tile)
        jax.block_until_ready(d)

    run(q)  # compile + warm
    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        run(q * (1.0 + (r + 1) * 1e-6))
    qps = reps * n_q / (time.perf_counter() - t0)
    log(f"  exact {n//1000}k x {dim}d: {qps:.0f} qps (recall 1.0)")
    return {"n": n, "dim": dim, "qps": qps, "recall": 1.0}


def main() -> None:
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")

    n = int(os.environ.get("BENCH_N", 100_000))
    headline_n = int(os.environ.get("BENCH_HEADLINE_N", 1_000_000))
    ref_n = int(os.environ.get("BENCH_REF_N", 10_000))
    n_q = int(os.environ.get("BENCH_QUERIES", 1000))
    ref_q = min(n_q, 200)  # reference is ~ms per query; keep its sweep sane
    skip_ref = os.environ.get("BENCH_SKIP_REF", "0") == "1"
    cache_path = Path(os.environ.get("BENCH_REF_CACHE", ".bench_ref.json"))
    dim, k, target = 384, 10, 0.95

    log(f"bench: hnsw_N={n} headline_N={headline_n} ref_N={ref_n} "
        f"queries={n_q} target recall@{k}>={target}")
    data = synth_embeddings(n + n_q, dim, seed=0)
    x, q = data[:n], data[n:]

    log("== ours: HNSW detail @ N ==")
    ours_hnsw = bench_ours(x, q, k, target)

    log("== ours @ head-to-head N (hnsw + exact) ==")
    ours_small = bench_ours(x[:ref_n], q, k, target)
    ours_small_best = max(ours_small["qps"], ours_small["exact_qps"])

    log("== reference @ head-to-head N ==")
    ref = bench_reference(x[:ref_n], q[:ref_q], k, target, cache_path,
                          skip_ref)

    log("== headline: exact @ north-star corpus ==")
    headline = bench_exact_headline(headline_n, 768, n_q, k)

    vs_baseline = (ours_small_best / ref["qps"]) if ref else None

    details = {
        "config": {"hnsw_N": n, "headline_N": headline_n, "ref_N": ref_n,
                   "dim": dim, "k": k, "target_recall": target,
                   "M": 16, "ef_construction": 200},
        "headline_exact_1M_768": headline,
        "ours_hnsw_detail": ours_hnsw,
        "ours_matched": {**ours_small, "best_mode_qps": ours_small_best},
        "reference": ref,
        "vs_baseline": vs_baseline,
    }
    Path("BENCH_DETAILS.json").write_text(json.dumps(details, indent=2))
    log(json.dumps(details, indent=2))

    print(json.dumps({
        "metric": (
            "QPS/chip at recall@10>=0.95 on 1M x 768-d (best index mode; "
            "exact matmul+top-k, recall 1.0); vs_baseline = best-mode QPS "
            f"ratio vs reference on matched {ref_n // 1000}k corpus"
        ),
        "value": round(headline["qps"], 1),
        "unit": "qps",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
