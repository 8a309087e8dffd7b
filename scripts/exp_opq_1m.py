#!/usr/bin/env python
"""HNSW-over-PQ ablation + operating points at 1M x 768 (VERDICT round-2
item 2: separate graph quality from ADC scoring noise, then fix the
loser).

Rows (same graph, same wide-beam exploration budget):
  exact_score    — wide-beam scored from the exact bf16/PCA mirror
                   (isolates GRAPH quality; its recall is the ceiling any
                   scoring can reach on this graph at this budget)
  pq_tight       — ADC-scored traversal, rerank only k: adds BOTH ADC
                   selection noise and ADC ordering noise
  pq_full_rerank — ADC-scored traversal, full-pool exact rerank: ADC
                   only SELECTS; ordering is exact. The delta vs
                   exact_score is pure ADC selection loss; the delta vs
                   pq_tight is what rerank width recovers.

Reuses /tmp/wide1m_cache from exp_wide_1m.py. Writes ABLATION_OPQ.json.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from exp_wide_1m import get_index, log, recall_of, timed  # noqa: E402


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    N, DIM, B, K10 = 1_000_000, 768, 1000, 10
    index, x, q, gt = get_index(N, DIM, B)

    t0 = time.perf_counter()
    index.enable_wide(dims=128, seeds=4096)
    index.enable_pq(chunks=16, ksub=256, opq_iters=8)
    log(f"enable wide+pq(opq): {time.perf_counter() - t0:.0f}s")

    ef, F, T = 512, 64, 12
    rows = {}

    def run_mode(name, **kw):
        def run(v):
            return index.search_batch_wide(np.asarray(v), k=K10, **kw)[0]

        _, ids = index.search_batch_wide(q, k=K10, **kw)
        qps = timed(run, q, B)
        rec = recall_of(ids, gt, K10)
        log(f"{name}: recall={rec:.4f} qps={qps:.0f}")
        rows[name] = {"recall": rec, "qps": qps, **kw}

    run_mode("exact_score", ef=ef, frontier=F, steps=T)
    run_mode("pq_tight", ef=ef, frontier=F, steps=T, score="pq",
             rerank_k=K10)
    run_mode("pq_full_rerank", ef=ef, frontier=F, steps=T, score="pq",
             rerank_k=ef)
    # wider budget for the >=0.9 headline attempt
    run_mode("pq_wide_budget", ef=1024, frontier=128, steps=12,
             score="pq", rerank_k=1024)

    out = {
        "N": N, "dim": DIM, "graph": "bulk_build M=16 efc=200 l_max=5",
        "pq": "chunks=16 ksub=256 opq_iters=8",
        "budget": {"ef": ef, "F": F, "T": T},
        "rows": rows,
        "reading": (
            "exact_score bounds what the GRAPH can deliver at this "
            "budget; pq_full_rerank - exact_score = ADC selection loss; "
            "pq_tight - pq_full_rerank = ADC ordering loss (recovered "
            "by exact rerank width)."
        ),
    }
    Path("ABLATION_OPQ.json").write_text(json.dumps(out, indent=2))
    log("wrote ABLATION_OPQ.json")


if __name__ == "__main__":
    main()
