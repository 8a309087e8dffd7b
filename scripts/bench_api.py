#!/usr/bin/env python
"""End-to-end SERVICE benchmark: drive the two aiohttp services over HTTP
against a >=100k corpus and record API-level throughput/latency.

The engine numbers (BENCH_1M etc.) measure kernels; this measures what a
user of the reference's API surface actually gets: embed -> store ->
index via POST /embed/batch-docs, then query via POST /search and
POST /search/batch (reference surface: api/app.py:119-233). Uses the
deterministic fake embedder (offline) and the CPU engine by default so
the artifact is environment-reproducible; set BENCH_API_DEVICE=auto to
let the indexing service use the TPU.

Writes BENCH_API.json. Run: python scripts/bench_api.py
"""

import json
import os
import signal
import statistics
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# an outer `timeout N` sends SIGTERM, which skips `finally` unless it is
# turned into an exception — orphaned service children then hold the TPU
# claim indefinitely (the 2026-08-17 relay-outage trigger)
signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))


def log(m):
    print(m, file=sys.stderr, flush=True)


def wait_health(url, timeout=120):
    import httpx

    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            r = httpx.get(url + "/health", timeout=5)
            if r.status_code == 200:
                return r.json()
        except Exception:
            pass
        time.sleep(1.0)
    raise RuntimeError(f"{url} never became healthy")


def main():
    import httpx

    n_docs = int(os.environ.get("BENCH_API_DOCS", 100_000))
    n_queries = int(os.environ.get("BENCH_API_QUERIES", 2000))
    device = os.environ.get("BENCH_API_DEVICE", "cpu")
    dim = 64

    tmp = Path(tempfile.mkdtemp(prefix="bench_api_"))
    (tmp / "data").mkdir()
    cfg = tmp / "config.yaml"
    cfg.write_text(f"""\
embedding: {{model: "fake-{dim}", dimension: {dim}}}
device: {device}
index:
  ef_construction: 100
  M: 16
  flush_threshold: 1000000
  wide: {{dims: 0, seeds: 2048, frontier: 32, steps: 10, min_size: 4096}}
vector_db: {{file_path: {tmp}/data/vdb, dimension: {dim}, capacity: {n_docs + 1024}}}
""")
    env = dict(os.environ, CONFIG_PATH=str(cfg))
    procs = []
    try:
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "vector_db_tpu.api.embedding_app"],
            env=dict(env, PORT="8301"), cwd=REPO,
            stdout=open(tmp / "emb.log", "w"), stderr=subprocess.STDOUT))
        wait_health("http://127.0.0.1:8301")
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "vector_db_tpu.api.app"],
            env=dict(env, PORT="8300", USE_EMBEDDING_SERVICE="true",
                     EMBEDDING_SERVICE_URL="http://127.0.0.1:8301"),
            cwd=REPO,
            stdout=open(tmp / "idx.log", "w"), stderr=subprocess.STDOUT))
        wait_health("http://127.0.0.1:8300")
        base = "http://127.0.0.1:8300"
        results = {"n_docs": n_docs, "dim": dim, "device": device}

        # ---- ingest via /embed/batch-docs ----
        rng = np.random.default_rng(0)
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
                 "eta", "theta", "iota", "kappa", "lam", "mu"]

        def doc(i):
            w = rng.choice(words, size=6)
            return (f"doc {i}: " + " ".join(w),
                    {"topic": words[i % len(words)]})

        batch = int(os.environ.get("BENCH_API_INGEST_BATCH", 1000))
        t0 = time.perf_counter()
        # generous read timeout: a batch that lands on a new power-of-two
        # capacity bucket triggers an XLA recompile of the insert program
        # (minutes on CPU at 100k scale) while the server holds the request
        with httpx.Client(timeout=httpx.Timeout(1800, connect=10)) as client:
            for s in range(0, n_docs, batch):
                docs = [doc(i) for i in range(s, min(s + batch, n_docs))]
                r = client.post(base + "/embed/batch-docs", json={
                    "contents": [c for c, _ in docs],
                    "metadatas": [m for _, m in docs]})
                r.raise_for_status()
                if (s // batch) % 10 == 0:
                    el = time.perf_counter() - t0
                    log(f"ingest {s + len(docs)}/{n_docs} "
                        f"({(s + len(docs)) / el:.0f} docs/s)")
        ingest_s = time.perf_counter() - t0
        results["ingest"] = {"seconds": ingest_s,
                             "docs_per_s": n_docs / ingest_s,
                             "batch": batch}
        log(f"ingest: {n_docs / ingest_s:.0f} docs/s")

        # ---- single-query latency (sequential, percentiles) ----
        # warm (untimed): the first search at the grown corpus size
        # compiles a fresh kernel server-side (minutes on CPU) — do it
        # outside the latency loop with a compile-sized timeout
        with httpx.Client(timeout=httpx.Timeout(1800, connect=10)) as c:
            c.post(base + "/search", json={"query": "warm", "top_k": 10,
                                           "ef": 100}).raise_for_status()
        lat = []
        with httpx.Client(timeout=600) as client:
            for i in range(200):
                q = {"query": f"doc {rng.integers(n_docs)}: alpha beta",
                     "top_k": 10, "ef": 100}
                t0 = time.perf_counter()
                r = client.post(base + "/search", json=q)
                lat.append((time.perf_counter() - t0) * 1e3)
                r.raise_for_status()
        lat.sort()
        results["search_single"] = {
            "p50_ms": statistics.median(lat),
            "p90_ms": lat[int(0.9 * len(lat))],
            "p99_ms": lat[int(0.99 * len(lat))],
            "qps_sequential": 1000.0 / statistics.median(lat),
        }
        log(f"single search p50={results['search_single']['p50_ms']:.1f}ms")

        # ---- batch-query throughput ----
        qbatch = int(os.environ.get("BENCH_API_QBATCH", 500))
        queries = [f"doc {rng.integers(n_docs)}: " +
                   " ".join(rng.choice(words, size=4))
                   for _ in range(n_queries)]
        with httpx.Client(timeout=httpx.Timeout(1800, connect=10)) as c:
            # warm the batch shape (fresh compile server-side)
            c.post(base + "/search/batch", json={
                "queries": queries[:qbatch], "top_k": 10,
                "ef": 100}).raise_for_status()
        t0 = time.perf_counter()
        with httpx.Client(timeout=600) as client:
            for s in range(0, n_queries, qbatch):
                r = client.post(base + "/search/batch", json={
                    "queries": queries[s : s + qbatch], "top_k": 10,
                    "ef": 100})
                r.raise_for_status()
        el = time.perf_counter() - t0
        results["search_batch"] = {"qps": n_queries / el,
                                   "batch": qbatch,
                                   "n_queries": n_queries}
        log(f"batch search: {n_queries / el:.0f} qps (batch={qbatch})")

        # ---- filtered search sanity + latency ----
        with httpx.Client(timeout=600) as client:
            t0 = time.perf_counter()
            r = client.post(base + "/search", json={
                "query": "doc 5: alpha", "top_k": 5,
                "metadata_filter": {"topic": "alpha"}})
            r.raise_for_status()
            results["search_filtered_ms"] = (time.perf_counter() - t0) * 1e3
            for hit in r.json()["results"]:
                assert hit["metadata"]["topic"] == "alpha"

        Path("BENCH_API.json").write_text(json.dumps(results, indent=2))
        log("wrote BENCH_API.json")
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except Exception:
                p.kill()


if __name__ == "__main__":
    main()
