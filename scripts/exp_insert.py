#!/usr/bin/env python
"""Streaming-insert phase attribution (VERDICT r2 weak #6).

Warm insert runs ~1.6-2.1k vec/s vs bulk_build's 4.5k+. One fused
program per batch = candidates (exact tiled MXU scan) + grouped commit
(sort/segment backlink merge). This times the phases separately at two
corpus scales so the optimization targets the measured bound, not a
guess:

- full: insert_step_exact end-to-end (the production path)
- cand: construction_candidates_exact alone
- commit: commit_inserts_grouped alone (pre-computed candidates)

Writes EXP_INSERT.json. Run on TPU: python scripts/exp_insert.py
"""

import json
import random
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vector_db_tpu.datasets import embedding_like
    from vector_db_tpu.index import hnsw_kernels as K
    from vector_db_tpu.index.hnsw import HNSW
    from vector_db_tpu.ops.distance import l2_sq_pairwise

    DIM, M, EFC, LMAX = 768, 16, 200, 5
    out = {"dim": DIM, "M": M, "ef_construction": EFC, "rows": []}

    for n_base, cap, batches in [(100_000, 1 << 17, 4), (900_000, 1 << 20, 4)]:
        log(f"--- corpus {n_base}, capacity {cap} ---")
        data = embedding_like(n_base + 16 * 4096, DIM, 3)
        base, fresh = data[:n_base], data[n_base:]
        index = HNSW(M=M, ef_construction=EFC, rng=random.Random(42),
                     capacity=cap, l_max=LMAX)
        t0 = time.perf_counter()
        index.bulk_build(list(range(n_base)), base)
        jax.block_until_ready(index.graph.neighbors)
        log(f"bulk_build: {time.perf_counter() - t0:.0f}s")

        for B in (1024, 4096):
            tile = min(cap, 32768)
            nxt = n_base
            # warm both compiled programs on a throwaway batch
            def one_insert(embs, ids):
                index.insert_arrays(ids, embs, batch_size=B)

            one_insert(fresh[:B], list(range(nxt, nxt + B)))
            nxt += B
            t0 = time.perf_counter()
            used = 0
            for i in range(batches):
                sel = fresh[B + i * B: B + (i + 1) * B]
                one_insert(sel, list(range(nxt, nxt + len(sel))))
                nxt += len(sel)
                used += len(sel)
            jax.block_until_ready(index.graph.neighbors)
            full_s = time.perf_counter() - t0
            vps = used / full_s
            log(f"B={B}: full {vps:.0f} vec/s")

            # phase attribution on a fixed batch (graph state frozen —
            # candidates/commit both jitted standalone)
            embs = jnp.asarray(fresh[:B])
            slots = jnp.arange(cap - B, cap, dtype=jnp.int32)
            lvls = jnp.asarray(
                [index.sample_level() for _ in range(B)], jnp.int32)

            cand_fn = jax.jit(
                lambda g, e, h, ne: K.construction_candidates_exact(
                    g, e, h, ne, l_max=LMAX, ef_construction=EFC,
                    ef_upper=min(EFC, 64), tile=tile),
            )
            cd, cs = cand_fn(index.graph, index._emb, index._has_emb, embs)
            jax.block_until_ready((cd, cs))
            reps = 3
            t0 = time.perf_counter()
            for r in range(reps):
                jax.block_until_ready(cand_fn(
                    index.graph, index._emb, index._has_emb,
                    embs * (1 + 1e-6 * r)))
            cand_s = (time.perf_counter() - t0) / reps

            batch_d = jax.jit(l2_sq_pairwise)(embs, embs)
            commit_fn = jax.jit(
                lambda g, e, h, sl, lv, cdd, css, bd:
                K.commit_inserts_grouped(
                    g, e, h, sl, lv, cdd, css, bd,
                    M=M, l_max=LMAX, ef_construction=EFC),
            )
            g2 = commit_fn(index.graph, index._emb, index._has_emb,
                           slots, lvls, cd, cs, batch_d)
            jax.block_until_ready(g2.neighbors)
            t0 = time.perf_counter()
            for r in range(reps):
                g2 = commit_fn(index.graph, index._emb, index._has_emb,
                               slots, lvls, cd * (1 + 1e-6 * r), cs, batch_d)
                jax.block_until_ready(g2.neighbors)
            commit_s = (time.perf_counter() - t0) / reps
            del g2

            row = {"n_base": n_base, "B": B, "full_vps": vps,
                   "cand_s": cand_s, "commit_s": commit_s,
                   "cand_vps": B / cand_s, "commit_vps": B / commit_s}
            log(f"B={B}: cand {cand_s*1e3:.0f}ms commit {commit_s*1e3:.0f}ms")
            out["rows"].append(row)
            Path("EXP_INSERT.json").write_text(json.dumps(out, indent=1))
        del index, data
    log("wrote EXP_INSERT.json")


if __name__ == "__main__":
    main()
