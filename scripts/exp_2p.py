#!/usr/bin/env python
"""Two-phase (per-block top-m kernel) recall-1.0 scan sweep (VERDICT r5 #3).

The 3-phase path sustains 40.9k QPS at recall 1.0 while the bf16 scan
proves the dispatch pipeline does 72k+ — the gap is block selection + the
mirror block-gather rescore (EXP_P1 stages). block_select_search_2p
replaces all of it with the fused per-block top-m kernel + one global
top_k + exact rescore. This sweeps m / rows_k / p1 grid sizes per-call
and pipelined (queue depth 8) at 1M x 768 against the cached ground
truth, plus the 3p incumbent as control. Writes EXP_2P.json.
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


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vector_db_tpu.ops.exact import (
        block_select_search_2p,
        block_select_search_3p,
    )

    data = np.load(CACHE / "data.npy", mmap_mode="r")
    x = jnp.asarray(np.asarray(data[:N]))
    q = jnp.asarray(np.asarray(data[N:]))
    valid = jnp.ones((N,), bool)
    x_sq = jnp.sum(x * x, axis=-1)
    gt = np.load(CACHE / "gt.npy")

    cov = np.asarray(jax.jit(
        lambda e: jnp.dot(e.T, e, preferred_element_type=jnp.float32))(x)
    ) / N
    _, vecs = np.linalg.eigh(cov.astype(np.float64))
    proj = jnp.asarray(vecs[:, ::-1][:, :128].astype(np.float32))
    ptab = jnp.dot(x, proj,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    jax.block_until_ready((ptab, x_sq))

    def recall_of(ids):
        return float(np.mean(
            [len(set(ids[i][:K].tolist()) & set(gt[i].tolist())) / K
             for i in range(len(gt))]))

    def measure(label, d, extra):
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(d(q))
            compile_s = round(time.perf_counter() - t0, 1)
            rec = recall_of(np.asarray(d(q)))
            ts = []
            for r in range(3):
                v = q * (1.0 + (r + 1) * 1e-6)
                t0 = time.perf_counter()
                jax.block_until_ready(d(v))
                ts.append(time.perf_counter() - t0)
            percall = float(np.median(ts))
            ts = []
            for r in range(3):
                vs = [q * (1.0 + (r * DEPTH + i + 1) * 1e-6)
                      for i in range(DEPTH)]
                t0 = time.perf_counter()
                outs = [d(v) for v in vs]
                jax.block_until_ready(outs)
                ts.append(time.perf_counter() - t0)
            pipe = float(np.median(ts))
            row = {"label": label, **extra, "recall": round(rec, 4),
                   "percall_qps": round(B / percall),
                   "pipelined_qps": round(DEPTH * B / pipe),
                   "pipe_rep_s": round(pipe, 4),
                   "compile_s": compile_s}
        except Exception as e:
            row = {"label": label, **extra, "error": repr(e)[:300]}
        log(f"{row}")
        return row

    out = {"N": N, "B": B, "depth": DEPTH, "rows": []}

    def save():
        Path("EXP_2P.json").write_text(json.dumps(out, indent=1))

    # control: the shipped 3p operating point
    def d3p(qv):
        sq = jnp.dot(qv, proj, preferred_element_type=jnp.float32)
        return block_select_search_3p(
            qv, ptab, sq, x_sq, x, valid, K, tile=131072, blocks_k=20,
            rows_k=80, pallas_phase1=True, p2_chunk=2)[1]

    out["rows"].append(measure("3p_bk20_r80_chunk2", d3p, {}))
    save()

    for m, rows_k, tile, qtile in (
        (4, 80, 4096, 512),
        (2, 80, 4096, 512),
        (4, 40, 4096, 512),
        (8, 80, 4096, 512),
        (4, 80, 4096, 1024),
        (4, 80, 2048, 512),
    ):
        def d2p(qv, m=m, rows_k=rows_k, tile=tile, qtile=qtile):
            sq = jnp.dot(qv, proj, preferred_element_type=jnp.float32)
            return block_select_search_2p(
                qv, ptab, sq, x_sq, x, valid, K, block=128, m=m,
                rows_k=rows_k, p1_tile=tile, p1_qtile=qtile)[1]

        out["rows"].append(measure(
            f"2p_m{m}_r{rows_k}_t{tile}_q{qtile}", d2p,
            {"m": m, "rows_k": rows_k, "tile": tile, "qtile": qtile}))
        save()
    log("done")


if __name__ == "__main__":
    main()
