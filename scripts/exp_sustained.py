#!/usr/bin/env python
"""Sustained (pipelined) serving throughput at 1M x 768 (VERDICT r4).

Round-4 attribution (EXP_P1.json): ONE jitted program of qp-projection +
Pallas block-min phase 1 runs at ~25 ms/call end-to-end while its device
roofline is ~1.5 ms — the axon relay's fixed per-dispatch round trip
dominates every per-batch forced-sync number. A serving system does not
sync per batch: it keeps a queue of in-flight batches, and TPU execution
is in-order, so queue-depth D amortizes the round trip D-fold while the
device stays busy.

This measures, for the headline modes:
  - percall : forced sync per batch (latency-true; the round-3 method)
  - pipelined(D): D batches dispatched back-to-back, one sync at the end
    (throughput-true; every dispatch uses distinct inputs so nothing
    memoizes, and all D outputs are block_until_ready'd)
  - big-batch: B=4096 per call (amortizes RTT inside one dispatch)

Recall is checked once per mode against the cached 1M ground truth.
Writes EXP_SUSTAINED.json.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CACHE = Path("/tmp/wide1m_cache")
N, DIM, B, K = 1_000_000, 768, 1000, 10
DEPTH = 8


def log(m):
    print(m, file=sys.stderr, flush=True)


def recall_of(ids, gt, k):
    return float(np.mean(
        [len(set(ids[i][:k].tolist()) & set(gt[i].tolist())) / k
         for i in range(len(gt))]))


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vector_db_tpu.ops.exact import (approx_search_tiled,
                                         block_select_search_3p)

    data = np.load(CACHE / "data.npy", mmap_mode="r")
    x_np = np.asarray(data[:N])
    q_np = np.asarray(data[N:])
    x = jnp.asarray(x_np)
    q = jnp.asarray(q_np)
    valid = jnp.ones((N,), bool)
    x_sq = jnp.sum(x * x, axis=-1)
    gt = np.load(CACHE / "gt.npy")

    # PCA-128 bf16 mirror for the 3p mode (same construction as serving:
    # hnsw.enable_scan_mirror)
    cov = np.asarray(jax.jit(
        lambda e: jnp.dot(e.T, e, preferred_element_type=jnp.float32))(x)
    ) / N
    _, vecs = np.linalg.eigh(cov.astype(np.float64))
    proj = jnp.asarray(vecs[:, ::-1][:, :128].astype(np.float32))
    ptab = jnp.dot(x, proj,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    btab = x.astype(jnp.bfloat16)
    jax.block_until_ready((ptab, btab, x_sq))

    out = {"N": N, "dim": DIM, "B": B, "k": K, "depth": DEPTH, "modes": []}

    def bench_mode(label, dispatch, recall_ids, b=B):
        """dispatch(qv) -> device result (NO sync); recall_ids(qv) -> ids."""
        # distinct inputs per dispatch so nothing memoizes
        variants = [q * (1.0 + i * 1e-6) for i in range(5 + 3 * DEPTH)]
        # warm/compile
        t0 = time.perf_counter()
        jax.block_until_ready(dispatch(variants[0]))
        compile_s = round(time.perf_counter() - t0, 1)
        jax.block_until_ready(dispatch(variants[1]))

        # per-call (forced sync each batch)
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(dispatch(variants[2 + r]))
            ts.append(time.perf_counter() - t0)
        percall_ms = float(np.median(ts)) * 1e3

        # pipelined at depth D: dispatch D, sync all at the end
        ts = []
        for r in range(3):
            vs = variants[5 + r * DEPTH:5 + (r + 1) * DEPTH]
            assert len(vs) == DEPTH
            t0 = time.perf_counter()
            outs = [dispatch(v) for v in vs]
            jax.block_until_ready(outs)
            ts.append(time.perf_counter() - t0)
        pipe_s = float(np.median(ts))

        rec = recall_of(recall_ids(q), gt, K)
        row = {"label": label, "recall": rec, "compile_s": compile_s,
               "percall_ms": round(percall_ms, 2),
               "percall_qps": round(b / (percall_ms / 1e3)),
               "pipelined_qps": round(DEPTH * b / pipe_s),
               "pipe_rep_s": round(pipe_s, 4)}
        log(f"{row}")
        out["modes"].append(row)
        Path("EXP_SUSTAINED.json").write_text(json.dumps(out, indent=1))

    # mode 1: bf16 fused scan (recall ~0.998 operating point)
    def d_bf16(qv):
        return approx_search_tiled(qv, btab, valid, K, tile=125000,
                                   x_sq=x_sq)[1]

    bench_mode("bf16_scan", d_bf16, lambda qv: np.asarray(d_bf16(qv)))

    # mode 2: blocksel 3p pallas (recall 1.0 operating point — EXP_P1
    # full rows: bk20/r40 measured recall 1.0 at the best QPS)
    def d_3p(qv):
        sq = jnp.dot(qv, proj, preferred_element_type=jnp.float32)
        return block_select_search_3p(
            qv, ptab, sq, x_sq, x, valid, K, tile=131072,
            blocks_k=20, rows_k=40, pallas_phase1=True)[1]

    bench_mode("blocksel_3p_pallas", d_3p, lambda qv: np.asarray(d_3p(qv)))

    # mode 4: big batch — 4096 queries in one dispatch (tile the 1000)
    q4 = jnp.concatenate([q * (1.0 + i * 1e-6) for i in range(4)]
                         + [q[:96] * 1.5])
    assert q4.shape[0] == 4096

    def d_bf16_4k(qv):
        return approx_search_tiled(qv, btab, valid, K, tile=125000,
                                   x_sq=x_sq)[1]

    def bench_big(label, dispatch):
        variants = [q4 * (1.0 + i * 1e-6) for i in range(8)]
        t0 = time.perf_counter()
        jax.block_until_ready(dispatch(variants[0]))
        compile_s = round(time.perf_counter() - t0, 1)
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(dispatch(variants[1 + r]))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        ids4 = np.asarray(dispatch(variants[4]))[:B]
        row = {"label": label, "B": 4096, "recall": recall_of(ids4, gt, K),
               "compile_s": compile_s, "percall_ms": round(med * 1e3, 2),
               "percall_qps": round(4096 / med)}
        log(f"{row}")
        out["modes"].append(row)
        Path("EXP_SUSTAINED.json").write_text(json.dumps(out, indent=1))

    bench_big("bf16_scan_B4096", d_bf16_4k)

    def d_3p_4k(qv):
        sq = jnp.dot(qv, proj, preferred_element_type=jnp.float32)
        return block_select_search_3p(
            qv, ptab, sq, x_sq, x, valid, K, tile=131072,
            blocks_k=20, rows_k=40, pallas_phase1=True)[1]

    bench_big("blocksel_3p_B4096", d_3p_4k)
    log("done")


if __name__ == "__main__":
    main()
