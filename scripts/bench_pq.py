#!/usr/bin/env python
"""BASELINE.md config 3: SIFT1M PQ benchmark (m=16, nbits=8; 32x).

Uses REAL SIFT1M when a TEXMEX directory is present (``SIFT1M_DIR``, see
vector_db_tpu.datasets.load_sift1m). This environment has no network
egress, so the default stand-in is ``datasets.sift_like`` — an anisotropic
Gaussian mixture with log-normal cluster sizes matching published SIFT1M
ANN-difficulty characteristics (NOT the old rank-24 product corpus; that
one under-clustered and made ADC look artificially bad). The output
labels which corpus was used.

Reports ADC recall@100 + scan QPS for: plain PQ, OPQ-rotated PQ, and
fetch-4x + exact rerank. Published reference points for real SIFT1M,
m=16/nbits=8: ADC recall@100 ~= 0.92-0.95 (Jegou et al., PAMI 2011,
Table III "ADC"; OPQ raises it further). Writes BENCH_PQ.json.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

# allow running as `python scripts/<name>.py` without PYTHONPATH
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vector_db_tpu.datasets import load_sift1m, sift_like
    from vector_db_tpu.index.pq import (
        PQCodec,
        _adc_lut,
        _adc_search_matmul,
        _encode_scan,
    )
    from vector_db_tpu.ops.distance import gather_l2_sq
    from vector_db_tpu.ops.exact import exact_search_tiled
    from vector_db_tpu.ops.topk import masked_top_k_smallest

    N, DIM, B, K = 1_000_000, 128, 1000, 100
    real = load_sift1m()
    if real is not None:
        base, queries, _ = real
        corpus, q = base[:N], queries[:B]
        data_label = "SIFT1M (real, TEXMEX files)"
    else:
        corpus, q = sift_like(N, dim=DIM, seed=0, queries=B)
        data_label = ("sift_like synthetic: anisotropic Gaussian mixture, "
                      "log-normal cluster sizes (no egress for real SIFT1M)")
    log(f"data: {data_label}")

    results = {"N": N, "dim": DIM, "m": 16, "nbits": 8, "k": K,
               "compression_x": DIM * 4 / 16, "data": data_label}

    pad = (-N) % 8192
    corpus_dev = jnp.asarray(
        np.concatenate([corpus, np.zeros((pad, DIM), np.float32)])
        if pad else corpus
    )
    qd = jnp.asarray(np.asarray(q, np.float32))
    valid = jnp.ones((N,), bool)
    log("exact ground truth...")
    gt = np.asarray(exact_search_tiled(
        qd, corpus_dev[:N], valid, K, tile=31250)[1])

    rng = np.random.default_rng(0)
    train_rows = corpus[rng.choice(N, 131072, replace=False)]

    @jax.jit
    def rerank(lut_arg, q_arg, codes_arg, corpus_arg, valid_arg):
        # all large arrays are ARGUMENTS: closure-captured device arrays
        # get baked into the HLO as constants (remote compile rejects the
        # resulting multi-hundred-MB program)
        d4, i4 = _adc_search_matmul(lut_arg, codes_arg, valid_arg, 4 * K,
                                    256, tile=8192)

        def one(qv, ids):
            dv = gather_l2_sq(qv, corpus_arg, ids,
                              jnp.ones_like(ids, dtype=bool))
            return masked_top_k_smallest(dv, ids, K)

        return jax.vmap(one)(q_arg, i4)

    def recall_of(ids):
        return float(np.mean(
            [len(set(ids[i]) & set(gt[i])) / K for i in range(B)]
        ))

    for label, opq_iters in [("pq", 0), ("opq", 8)]:
        codec = PQCodec(k=256, chunks=16, dim=DIM)
        t0 = time.perf_counter()
        codec.train(train_rows, seed=0, restarts=2, opq_iters=opq_iters)
        train_s = time.perf_counter() - t0
        rot = (jnp.asarray(codec.rotation)
               if codec.rotation is not None else None)
        t0 = time.perf_counter()
        codes = _encode_scan(corpus_dev, codec.codebooks, chunk=8192,
                             rotation=rot)[:N]
        jax.block_until_ready(codes)
        encode_s = time.perf_counter() - t0
        log(f"[{label}] train {train_s:.0f}s encode {encode_s:.0f}s "
            f"({N/encode_s:.0f} vec/s)")

        lut = _adc_lut(codec.rotate_queries(np.asarray(qd)), codec.codebooks)
        ids = np.asarray(_adc_search_matmul(
            lut, codes, valid, K, 256, tile=8192)[1])
        lut2 = _adc_lut(codec.rotate_queries(np.asarray(qd) * (1 + 1e-6)),
                        codec.codebooks)
        t0 = time.perf_counter()
        d2, _ = _adc_search_matmul(lut2, codes, valid, K, 256, tile=8192)
        jax.block_until_ready(d2)
        qps = B / (time.perf_counter() - t0)
        rec = recall_of(ids)
        log(f"[{label}] ADC scan: recall@{K}={rec:.3f} qps={qps:.0f}")

        d_r, i_r = rerank(lut, qd, codes, corpus_dev[:N], valid)
        jax.block_until_ready(d_r)
        t0 = time.perf_counter()
        d_x, _ = rerank(lut2, qd * (1 + 1e-6), codes, corpus_dev[:N], valid)
        jax.block_until_ready(d_x)
        qps_rr = B / (time.perf_counter() - t0)
        rec_rr = recall_of(np.asarray(i_r))
        log(f"[{label}] fetch-4x + exact rerank: recall@{K}={rec_rr:.3f} "
            f"qps={qps_rr:.0f}")

        results[label] = {
            "train_s": train_s, "encode_vps": N / encode_s,
            "adc_recall_at_100": rec, "adc_qps": qps,
            "rerank_recall_at_100": rec_rr, "rerank_qps": qps_rr,
        }

    Path("BENCH_PQ.json").write_text(json.dumps(results, indent=2))
    log("done")


if __name__ == "__main__":
    main()
