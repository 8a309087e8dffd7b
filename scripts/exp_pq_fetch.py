#!/usr/bin/env python
"""Residual-IVFADC rerank-width sweep (VERDICT r3 #7).

BENCH_SIFT round 3: residual IVF-PQ (m=16, OPQ-4) at n_probe=16,
fetch=128 reached recall@10 = 0.884 @ 766 QPS while the probe ceiling at
n_probe=16 is 0.998 — the entire loss is true neighbors missing the
ADC top-``fetch`` cut. OPQ-on-residuals is already on; the untried lever
is the exact-rerank width. This sweeps fetch (and n_probe) for k=10 and
k=100 on the sift-like 1M corpus. Target: >=0.95 @ >=700 QPS at
16 B/vector. Writes EXP_PQ_FETCH.json.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(run, q, n_q, reps=3):
    import jax

    for w in range(3):
        jax.block_until_ready(run(q * (1.0 + w * 1e-7)))
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(q * (1.0 + (r + 1) * 1e-6)))
        ts.append(time.perf_counter() - t0)
    return n_q / float(np.median(ts))


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from vector_db_tpu.datasets import load_sift1m, sift_like
    from vector_db_tpu.index.ivf import IvfIndex
    from vector_db_tpu.ops.exact import exact_search_tiled

    N, B, K = 1_000_000, 1000, 10
    real = load_sift1m()
    if real is not None:
        base, queries, _ = real
        x, q = base[:N], queries[:B].astype(np.float32)
    else:
        x, q = sift_like(N, dim=128, seed=0, queries=B)
    qd = jnp.asarray(q)

    ivf = IvfIndex(k=4096)
    t0 = time.perf_counter()
    ivf.build_arrays(range(N), x, seed=0, iters=20, spill=1,
                     list_cap_alpha=2.0)
    log(f"build: {time.perf_counter() - t0:.0f}s")
    t0 = time.perf_counter()
    ivf.enable_pq(chunks=16, ksub=256, opq_iters=4, residual=True)
    log(f"enable_pq: {time.perf_counter() - t0:.0f}s")

    tile = 31250
    gt10 = np.asarray(exact_search_tiled(
        qd, ivf._emb, ivf._has_emb, K, tile=tile)[1])
    gt10_ids = ivf._store.ids_of(gt10)
    gt100 = np.asarray(exact_search_tiled(
        qd, ivf._emb, ivf._has_emb, 100, tile=tile)[1])
    gt100_ids = ivf._store.ids_of(gt100)

    def recall_of(ids, gt_ids, kk):
        return float(np.mean(
            [len(set(np.asarray(ids[i]).tolist())
                 & set(gt_ids[i].tolist())) / kk for i in range(B)]))

    adc = os.environ.get("EXP_ADC", "onehot8")
    rows_env = os.environ.get("EXP_ROWS", "")
    grid = (tuple(tuple(int(v) for v in r.split(",")) for r in
            rows_env.split(";")) if rows_env else
            ((16, 256, 10), (16, 512, 10),
             (16, 1024, 10), (32, 512, 10),
             (16, 512, 100), (16, 1024, 100),
             (32, 1024, 100)))
    out_path = os.environ.get("EXP_OUT", "EXP_PQ_FETCH.json")
    out = {"N": N, "dim": x.shape[1], "B": B, "adc": adc, "rows": []}
    for n_probe, fetch, kk in grid:
        def run(v, n_probe=n_probe, fetch=fetch, kk=kk):
            return ivf.search_batch(np.asarray(v), n_probe=n_probe,
                                    top_k=kk, pq=True, fetch=fetch,
                                    adc=adc)[0]

        try:
            t0 = time.perf_counter()
            _, ids = ivf.search_batch(q, n_probe=n_probe, top_k=kk,
                                      pq=True, fetch=fetch, adc=adc)
            compile_s = round(time.perf_counter() - t0, 1)
            rec = recall_of(ids, gt10_ids if kk == 10 else gt100_ids, kk)
            qps = timed(run, qd, B)
            row = {"n_probe": n_probe, "fetch": fetch, "k": kk,
                   "recall": round(rec, 4), "qps": round(qps),
                   "compile_s": compile_s}
        except Exception as e:
            row = {"n_probe": n_probe, "fetch": fetch, "k": kk,
                   "error": repr(e)[:300]}
        log(f"{row}")
        out["rows"].append(row)
        Path(out_path).write_text(json.dumps(out, indent=1))
    log("done")


if __name__ == "__main__":
    main()
