#!/usr/bin/env python
"""BASELINE.md config 3: SIFT1M-shaped PQ benchmark.

SIFT1M itself is not fetchable here (zero egress), so the corpus is
synthetic 128-d with SIFT-like local structure (low intrinsic dimension,
unnormalized positive-ish values). PQ m=16, nbits=8 (ksub=256) — 8 bytes
per vector vs 512 (64x compression). Reports ADC recall@100 vs exact and
scan throughput for the gather and one-hot-matmul formulations.
Writes BENCH_PQ.json.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

# allow running as `python scripts/<name>.py` without PYTHONPATH
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def synth_sift_like(n, dim=128, seed=0, intrinsic=24):
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((n, intrinsic)).astype(np.float32)
    v = rng.standard_normal((intrinsic, dim)).astype(np.float32)
    x = np.abs(u @ v) + 0.1 * np.abs(
        rng.standard_normal((n, dim)).astype(np.float32)
    )
    return x


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vector_db_tpu.index.pq import PQCodec, _adc_search_matmul, _encode_scan
    from vector_db_tpu.ops.exact import exact_search_tiled

    N, DIM, B, K = 1_000_000, 128, 1000, 100
    log(f"data {N}x{DIM}...")
    x = synth_sift_like(N + B, DIM)
    corpus, q = x[:N], x[N:]

    codec = PQCodec(k=256, chunks=16, dim=DIM)
    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    codec.train(corpus[rng.choice(N, 131072, replace=False)], seed=0,
                restarts=2)
    train_s = time.perf_counter() - t0
    log(f"train: {train_s:.0f}s")

    pad = (-N) % 8192
    corpus_dev = jnp.asarray(
        np.concatenate([corpus, np.zeros((pad, DIM), np.float32)])
        if pad else corpus
    )
    t0 = time.perf_counter()
    codes = _encode_scan(corpus_dev, codec.codebooks, chunk=8192)[:N]
    jax.block_until_ready(codes)
    encode_s = time.perf_counter() - t0
    log(f"encode: {encode_s:.0f}s = {N/encode_s:.0f} vec/s")

    qd = jnp.asarray(q)
    valid = jnp.ones((N,), bool)
    gt = np.asarray(exact_search_tiled(
        qd, corpus_dev[:N], valid, K, tile=31250)[1])

    from vector_db_tpu.index.pq import _adc_lut

    lut = _adc_lut(qd, codec.codebooks)

    def run_matmul():
        d, i = _adc_search_matmul(lut, codes, valid, K, 256, tile=8192)
        jax.block_until_ready(d)
        return np.asarray(i)

    ids = run_matmul()
    lut2 = _adc_lut(qd * (1.0 + 1e-6), codec.codebooks)
    t0 = time.perf_counter()
    d2, i2 = _adc_search_matmul(lut2, codes, valid, K, 256, tile=8192)
    jax.block_until_ready(d2)
    qps_mm = B / (time.perf_counter() - t0)
    recall = float(np.mean(
        [len(set(ids[i]) & set(gt[i])) / K for i in range(B)]
    ))
    log(f"ADC matmul scan: recall@{K}={recall:.3f} qps={qps_mm:.0f}")

    # ADC fetch-4x + exact rerank (the standard IVFADC serving recipe)
    import jax.numpy as jnp

    from vector_db_tpu.ops.topk import masked_top_k_smallest
    from vector_db_tpu.ops.distance import gather_l2_sq

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

    d_r, i_r = rerank(lut, qd, codes, corpus_dev[:N], valid)
    jax.block_until_ready(d_r)
    t0 = time.perf_counter()
    d_x, i_x = rerank(lut2, qd * (1.0 + 1e-6), codes, corpus_dev[:N], valid)
    jax.block_until_ready(d_x)
    qps_rr = B / (time.perf_counter() - t0)
    ids_r = np.asarray(i_r)
    recall_rr = float(np.mean(
        [len(set(ids_r[i]) & set(gt[i])) / K for i in range(B)]
    ))
    log(f"ADC fetch-4x + exact rerank: recall@{K}={recall_rr:.3f} "
        f"qps={qps_rr:.0f}")

    # NOTE: the gather ADC formulation materializes [B, chunks, N] — fine
    # for small corpora, 64GB at 1M. matmul formulation only at this scale.

    out = {
        "N": N, "dim": DIM, "m": 16, "nbits": 8, "k": K,
        "compression_x": DIM * 4 / 16,
        "train_s": train_s, "encode_vps": N / encode_s,
        "adc_recall_at_100": recall,
        "adc_matmul_qps": qps_mm,
        "adc_rerank_recall_at_100": recall_rr,
        "adc_rerank_qps": qps_rr,
    }
    Path("BENCH_PQ.json").write_text(json.dumps(out, indent=2))
    log("done")


if __name__ == "__main__":
    main()
