#!/usr/bin/env python
"""Latency-regime addendum (VERDICT r3 #3): the flagship graph config and
the recall-1.0 scan, measured at small batch on the 1M x 768 corpus.

bench_latency.py's first flagship pass measured wide-beam at ef=512/F=64
(its round-3 serving shape) — recall 0.81, losing to the bf16 scan on
both axes at B=1 (scan: 2.45 ms device / recall 0.997). This measures
the two missing operating points:

  - wide ef=1280 frontier=256 steps=8 (+early-exit): the >=0.95-recall
    flagship graph config (EXP_WIDE_FINAL winner)
  - blocksel_3p (Pallas block-min phase 1, p2_chunk=2): the recall-1.0
    scan

at B in {1, 8, 64}, appending rows into BENCH_LATENCY.json's
graph_1m_768 section (same relay-floor attribution).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

K = 10


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from exp_wide_1m import get_index

    from vector_db_tpu.ops.exact import block_select_search_3p

    N, DIM, B = 1_000_000, 768, 1000
    index, x, q_all, gt = get_index(N, DIM, B)
    index.enable_wide(dims=128, seeds=4096)
    emb = index._emb
    x_sq = jax.jit(lambda e: jnp.sum(e * e, -1))(emb)

    # PCA-128 bf16 mirror for the 3-phase block select (same recipe as
    # bench.py's headline 3p mode)
    cov = np.asarray(jax.jit(
        lambda e: jnp.dot(e.T, e, preferred_element_type=jnp.float32))(emb)
    ) / N
    _, vecs = np.linalg.eigh(cov.astype(np.float64))
    proj = jnp.asarray(vecs[:, ::-1][:, :128].astype(np.float32))
    ptab = jnp.dot(emb, proj,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    jax.block_until_ready((ptab, x_sq))

    def recall_of(ids):
        return float(np.mean(
            [len(set(ids[i][:K].tolist()) & set(gt[i].tolist())) / K
             for i in range(len(gt))]))

    tiny = jnp.zeros((8, 8), jnp.float32)
    fl = jax.jit(lambda t: jnp.sum(t * t))
    float(fl(tiny))
    floors = []
    for r in range(5):
        t0 = time.perf_counter()
        float(fl(tiny * (1.0 + r * 1e-6)))
        floors.append(time.perf_counter() - t0)
    floor_ms = float(np.median(floors)) * 1e3
    log(f"relay dispatch floor: {floor_ms:.1f} ms")

    def run_wide(v):
        return index.search_batch_wide(
            v, K, ef=1280, frontier=256, steps=8, early_exit=True)

    def run_3p(v):
        qv = jnp.asarray(v)
        qp = jnp.dot(qv, proj, preferred_element_type=jnp.float32)
        return block_select_search_3p(
            qv, ptab, qp, x_sq, emb, index._has_emb, K, tile=131072,
            blocks_k=2 * K, rows_k=4 * K, pallas_phase1=True, p2_chunk=2)

    modes = {"wide_ef1280_f256_ee": run_wide, "blocksel_3p": run_3p}

    rec, rows = {}, []
    for name, run in modes.items():
        _, ids = run(q_all)
        rec[name] = recall_of(np.asarray(ids))
        log(f"{name}: recall@10 = {rec[name]:.4f}")

    for b in (1, 8, 64):
        q = q_all[:b]
        for name, run in modes.items():
            jax.block_until_ready(np.asarray(run(q * (1.0 + 1e-7))[0]))
            times = []
            for r in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(
                    np.asarray(run(q * (1.0 + (r + 1) * 1e-6))[0]))
                times.append(time.perf_counter() - t0)
            ms = float(np.median(times)) * 1000
            row = {"batch": b, "mode": name, "ms_per_batch": round(ms, 2),
                   "qps": round(b / (ms / 1000)),
                   "recall": round(rec[name], 4),
                   "device_ms_est": round(max(0.0, ms - floor_ms), 2)}
            log(f"1M768 B={b} {name}: {ms:.1f} ms "
                f"({row['device_ms_est']} ms device) recall {rec[name]:.3f}")
            rows.append(row)

    out = Path("BENCH_LATENCY.json")
    d = json.loads(out.read_text())
    sec = d.setdefault("graph_1m_768", {"relay_floor_ms": round(floor_ms, 2),
                                        "rows": []})
    sec["addendum_floor_ms"] = round(floor_ms, 2)
    sec["rows"].extend(rows)
    out.write_text(json.dumps(d, indent=2))
    log("BENCH_LATENCY.json updated")


if __name__ == "__main__":
    main()
