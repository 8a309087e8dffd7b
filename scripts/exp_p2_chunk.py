#!/usr/bin/env python
"""Phase-2 temp-size A/B for the 3-phase block-select scan (VERDICT r4).

EXP_P1 stage attribution: phase 2 (per-row mirror rescore of the
selected blocks) is the 3p bottleneck — the [B, C, blk, ds] bf16 gather
is ~655 MB at B=1000/C=20/blk=128/ds=128 (sub-ms at HBM rate) yet costs
~27 ms, i.e. XLA materializes an f32 convert of the whole gather before
the einsum. p2_chunk scans candidate chunks to cap the live temp;
this sweeps chunk sizes at the recall-1.0 operating point (bk20/r40)
per-call and pipelined. Writes EXP_P2CHUNK.json.
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

    from vector_db_tpu.ops.exact import block_select_search_3p

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

    out = {"N": N, "B": B, "rows": []}
    for chunk in (0, 10, 5, 4, 2):
        def d(qv, chunk=chunk):
            sq = jnp.dot(qv, proj, preferred_element_type=jnp.float32)
            return block_select_search_3p(
                qv, ptab, sq, x_sq, x, valid, K, tile=131072,
                blocks_k=20, rows_k=40, pallas_phase1=True,
                p2_chunk=chunk)[1]

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
            row = {"p2_chunk": chunk, "recall": round(rec, 4),
                   "percall_qps": round(B / percall),
                   "pipelined_qps": round(DEPTH * B / pipe),
                   "compile_s": compile_s}
        except Exception as e:
            row = {"p2_chunk": chunk, "error": repr(e)[:300]}
        log(f"{row}")
        out["rows"].append(row)
        Path("EXP_P2CHUNK.json").write_text(json.dumps(out, indent=1))
    log("done")


if __name__ == "__main__":
    main()
