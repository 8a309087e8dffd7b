#!/usr/bin/env python
"""HNSW-over-PQ ablation + >=0.9-recall campaign at 1M x 768.

Round-2 VERDICT item 2 asked for (a) an ablation separating graph
quality from ADC scoring noise and (b) a fix landing the hybrid at
>=0.9 recall@10. Round-2's run (alpha=1.0 graph, chunks=16) measured:
exact-scored ceiling 0.806 at ef=512/F=64/T=12, pq_full_rerank 0.752,
best pq operating point 0.878 — graph quality was the binding limit,
ADC selection the runner-up.

This campaign attacks both losers, on the alpha-occlusion graph
(EXP_ALPHA=1.2 — CPU-measured +0.6-0.8 pts for the PQ hybrid at 100k)
and with finer codes (chunks=32: half the subspace dims, ~half the
reconstruction error feeding the decoded traversal mirror):

  exact_score      — graph ceiling at the campaign budget
  pq16 / pq32      — ADC traversal + full-pool exact rerank at the
                     round-2 budget (chunks effect, apples-to-apples)
  pq32_wide        — the >=0.9 headline attempt (wider budget)

Env: EXP_ALPHA (graph variant, default 1.2 here), EXP_OPQ_CHUNKS
(comma list, default "16,32"). Reuses /tmp/wide1m_cache* from
exp_wide_1m.py. Merges rows into ABLATION_OPQ.json keyed by
"alpha<alpha>" so the round-2 alpha=1.0 decomposition stays in the
artifact alongside the campaign rows.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("EXP_ALPHA", "1.2")

from exp_wide_1m import get_index, log, recall_of, timed  # noqa: E402


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    N, DIM, B, K10 = 1_000_000, 768, 1000, 10
    alpha = float(os.environ.get("EXP_ALPHA"))
    chunk_list = [int(c) for c in
                  os.environ.get("EXP_OPQ_CHUNKS", "16,32").split(",")]
    index, x, q, gt = get_index(N, DIM, B)

    t0 = time.perf_counter()
    index.enable_wide(dims=128, seeds=4096)
    log(f"enable_wide: {time.perf_counter() - t0:.0f}s")

    rows = {}

    def run_mode(name, **kw):
        def run(v):
            return index.search_batch_wide(np.asarray(v), k=K10, **kw)[0]

        _, ids = index.search_batch_wide(q, k=K10, **kw)
        qps = timed(run, q, B)
        rec = recall_of(ids, gt, K10)
        log(f"{name}: recall={rec:.4f} qps={qps:.0f}")
        rows[name] = {"recall": rec, "qps": qps, **kw}

    # graph ceiling at the round-2 comparison budget and the wide budget
    run_mode("exact_score", ef=512, frontier=64, steps=12)
    run_mode("exact_score_wide", ef=1024, frontier=128, steps=12)

    for chunks in chunk_list:
        t0 = time.perf_counter()
        index.enable_pq(chunks=chunks, ksub=256, opq_iters=8)
        log(f"enable_pq(chunks={chunks}, opq): "
            f"{time.perf_counter() - t0:.0f}s")
        run_mode(f"pq{chunks}", ef=512, frontier=64, steps=12,
                 score="pq", rerank_k=512)
        run_mode(f"pq{chunks}_wide", ef=1024, frontier=128, steps=12,
                 score="pq", rerank_k=1024)
    # headline attempt on the last (finest) codec if still short of 0.9
    if rows[f"pq{chunk_list[-1]}_wide"]["recall"] < 0.9:
        run_mode(f"pq{chunk_list[-1]}_xwide", ef=1536, frontier=192,
                 steps=14, score="pq", rerank_k=1536)

    path = Path("ABLATION_OPQ.json")
    out = json.loads(path.read_text()) if path.exists() else {}
    if "rows" in out and "by_graph" not in out:  # round-2 layout
        out = {"N": out.get("N", N), "dim": out.get("dim", DIM),
               "pq": out.get("pq"), "reading": out.get("reading"),
               "by_graph": {"alpha1.0": {"budget": out.get("budget"),
                                         "rows": out["rows"]}}}
    out.setdefault("by_graph", {})[f"alpha{alpha:g}"] = {
        "graph": f"bulk_build M=16 efc=200 l_max=5 alpha={alpha:g}",
        "pq": f"chunks in {chunk_list} ksub=256 opq_iters=8",
        "rows": rows,
    }
    out["campaign_reading"] = (
        "alpha graph raises the exact-scored ceiling; chunks=32 halves "
        "subspace dims so the decoded traversal mirror and the ADC "
        "selection both tighten. pqC rows = round-2 budget "
        "(ef=512/F=64/T=12, full rerank); *_wide = ef=1024/F=128; "
        "*_xwide only runs if the wide row misses 0.9."
    )
    path.write_text(json.dumps(out, indent=2))
    log("wrote ABLATION_OPQ.json")


if __name__ == "__main__":
    main()
