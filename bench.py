#!/usr/bin/env python
"""Headline benchmark: batched HNSW query throughput at recall@10 >= 0.95.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": <our QPS at BENCH_N>, "unit": "qps",
   "vs_baseline": <our QPS / reference QPS at the same matched config>}

vs_baseline is measured head-to-head: the reference implementation
(/root/reference, pure-Python HNSW on CPU) and this engine run on the SAME
corpus (BENCH_REF_N vectors of the same distribution), both tuned to the
first ef reaching recall@10 >= 0.95 against exact ground truth, and QPS is
compared at those operating points. The headline value is this engine's QPS
at the full BENCH_N corpus under the same recall constraint.

Data: synthetic "embedding-like" vectors — low intrinsic dimension (rank-64
mixing + noise, L2-normalized), matching the structure of real sentence-
embedding corpora (the reference's default all-MiniLM-L6-v2 is 384-d
L2-normalized; BASELINE.md config 1).

Env knobs:
  BENCH_N          corpus size for the headline number (default 100000)
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

    # exact-path throughput (recall 1.0 by construction)
    def run_exact():
        d, i = exact_search_tiled(qd, index._emb, index._has_emb, k,
                                  tile=25088)
        jax.block_until_ready(d)

    run_exact()
    t0 = time.perf_counter()
    run_exact()
    exact_qps = len(q) / (time.perf_counter() - t0)

    chosen = None
    for ef in EF_SWEEP:
        ms = 2 * ef + 16

        def run():
            d, s = K.search_batch(
                index.graph, index._emb, index._has_emb, qd, None,
                M=16, l_max=5, ef=ef, k=k, max_steps=ms,
                use_filter=False, pool=ef, expand=4,
            )
            jax.block_until_ready(d)
            return np.asarray(s)

        slots = run()  # compile + warm
        t0 = time.perf_counter()
        run()
        qps = len(q) / (time.perf_counter() - t0)
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


def main() -> None:
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    n = int(os.environ.get("BENCH_N", 100_000))
    ref_n = int(os.environ.get("BENCH_REF_N", 10_000))
    n_q = int(os.environ.get("BENCH_QUERIES", 1000))
    ref_q = min(n_q, 200)  # reference is ~ms per query; keep its sweep sane
    skip_ref = os.environ.get("BENCH_SKIP_REF", "0") == "1"
    cache_path = Path(os.environ.get("BENCH_REF_CACHE", ".bench_ref.json"))
    dim, k, target = 384, 10, 0.95

    log(f"bench: N={n} ref_N={ref_n} dim={dim} queries={n_q} "
        f"target recall@{k}>={target}")
    data = synth_embeddings(n + n_q, dim, seed=0)
    x, q = data[:n], data[n:]

    log("== ours @ headline N ==")
    ours_big = bench_ours(x, q, k, target)

    log("== ours @ head-to-head N ==")
    ours_small = bench_ours(x[:ref_n], q, k, target)

    log("== reference @ head-to-head N ==")
    ref = bench_reference(x[:ref_n], q[:ref_q], k, target, cache_path,
                          skip_ref)

    vs_baseline = (ours_small["qps"] / ref["qps"]) if ref else None

    details = {
        "config": {"N": n, "ref_N": ref_n, "dim": dim, "k": k,
                   "target_recall": target, "M": 16, "ef_construction": 200},
        "ours_headline": ours_big,
        "ours_matched": ours_small,
        "reference": ref,
        "vs_baseline": vs_baseline,
    }
    Path("BENCH_DETAILS.json").write_text(json.dumps(details, indent=2))
    log(json.dumps(details, indent=2))

    print(json.dumps({
        "metric": (
            f"batched HNSW QPS at recall@10>=0.95, "
            f"{n // 1000}k x {dim}d L2, M=16 efc=200 (1 chip)"
        ),
        "value": round(ours_big["qps"], 1),
        "unit": "qps",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
