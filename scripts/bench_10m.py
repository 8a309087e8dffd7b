#!/usr/bin/env python
"""10M x 768 on ONE chip (BASELINE config 5 scale): two-stage compressed
search with measured recall against exact ground truth.

10M x 768 f32 is 30 GB — it cannot exist on a 16 GB chip or cross the
relay. Everything therefore happens on device:

- the corpus is GENERATED on device chunk-by-chunk inside one lax.scan
  (clustered embedding-like: rank-64 mixture + noise, L2-normalized,
  deterministic keys);
- during generation the same scan (a) folds each f32 chunk into exact
  running top-k for the query set (the ground-truth oracle — the full f32
  corpus never exists at once), (b) emits the PCA-projected augmented
  bf16 mirror row [-2x_hat, ||x||^2] (2.7 GB), and (c) emits an int8
  full-dim mirror with per-row scales (7.7 GB) for stage-2 rerank;
- search = stage-1 block-min select on the RP mirror (ops/exact.py
  block_select_search phase-1 math) + stage-2 int8 rerank.

The reference's scale story at this size is full-copy replicas of a
30 GB Python process (reference README.md:123-126) — it cannot represent
this corpus at all. Writes BENCH_10M.json.
"""

import json
import os
import sys
import time
from functools import partial
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

    N = int(os.environ.get("BENCH10M_N", 10_000_000))
    # DP=120 keeps the augmented row (DP + 8) at exactly 128 lanes: a
    # 136-wide bf16 table tiles at (8,128)x2 = 1.9x padding waste — 4.8G
    # instead of 2.6G for the 10M mirror, which (plus the search
    # program's layout copy of it) OOMed the 16G chip
    DIM, DP, B, K = 768, 120, 1000, 10
    QS = 100  # query slice per inner step: bounds phase-2 gather memory
    CHUNK = 131072
    n_chunks = (N + CHUNK - 1) // CHUNK
    N_pad = n_chunks * CHUNK
    INTRINSIC = 64

    key = jax.random.key(7)
    k_mix, k_q, k_chunks = jax.random.split(key, 3)
    # fixed mixing matrix (the corpus's low-rank structure) + PCA proxy:
    # with x = z @ mix (z iid), the top-DP right-singular directions of
    # mix ARE the data's principal subspace — no training pass needed
    mix = jax.random.normal(k_mix, (INTRINSIC, DIM), jnp.float32)
    _, _, vt = jnp.linalg.svd(mix, full_matrices=False)  # [64, DIM]
    # principal subspace = mix's row space (rank 64); pad to DP dims with
    # an orthonormal complement so the projection also carries part of
    # the isotropic noise energy
    extra = jax.random.normal(jax.random.fold_in(k_mix, 2),
                              (DIM, DP), jnp.float32)
    basis, _ = jnp.linalg.qr(
        jnp.concatenate([vt.T, extra], axis=1))       # [DIM, 64+DP]
    proj = basis[:, :DP]                              # [DIM, DP]

    def gen(k, n):
        z = jax.random.normal(k, (n, INTRINSIC), jnp.float32)
        x = z @ mix + 0.12 * jax.random.normal(
            jax.random.fold_in(k, 1), (n, DIM), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    queries = gen(k_q, B)

    @partial(jax.jit, donate_argnums=())
    def build_all(qs):
        q_sq = jnp.sum(qs * qs, axis=1)

        def body(carry, ci):
            bd, bi = carry
            x = gen(jax.random.fold_in(k_chunks, ci), CHUNK)
            row_ok = (ci * CHUNK + jnp.arange(CHUNK)) < N
            xsq = jnp.where(row_ok, jnp.sum(x * x, axis=1), 3e38)
            # exact GT fold (HIGHEST: the oracle must be trustworthy)
            cross = jnp.dot(qs, x.T, precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
            d = q_sq[:, None] - 2.0 * cross + xsq[None, :]
            nd, pos = jax.lax.top_k(-d, K)
            ids = ci * CHUNK + pos
            md, mi = jax.lax.top_k(
                jnp.concatenate([-bd, nd], axis=1), K)
            mids = jnp.take_along_axis(
                jnp.concatenate([bi, ids], axis=1), mi, axis=1)
            # aug mirror row
            xm = jnp.dot(x, proj, preferred_element_type=jnp.float32)
            aug = jnp.zeros((CHUNK, DP + 8), jnp.bfloat16)
            aug = aug.at[:, :DP].set((-2.0 * xm).astype(jnp.bfloat16))
            aug = aug.at[:, DP].set(xsq.astype(jnp.bfloat16))
            # int8 full-dim mirror
            scale = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-9) / 127.0
            xi8 = jnp.round(x / scale[:, None]).astype(jnp.int8)
            return (-md, mids), (aug, xi8, scale.astype(jnp.float32),
                                 jnp.where(row_ok, jnp.sum(x * x, axis=1),
                                           3e38))

        init = (jnp.full((B, K), 3e38, jnp.float32),
                jnp.full((B, K), -1, jnp.int32))
        (gd, gi), (aug, xi8, scales, xsq) = jax.lax.scan(
            body, init, jnp.arange(n_chunks, dtype=jnp.int32))
        return (gd, gi, aug.reshape(N_pad, DP + 8),
                xi8.reshape(N_pad, DIM), scales.reshape(N_pad),
                xsq.reshape(N_pad))

    log(f"building 10M tables on device ({n_chunks} chunks)...")
    t0 = time.perf_counter()
    gd, gt, aug, xi8, scales, xsq = build_all(queries)
    jax.block_until_ready(aug)
    build_s = time.perf_counter() - t0
    log(f"gen+gt+mirrors: {build_s:.0f}s")
    gt = np.asarray(gt)

    # ---- two-stage search ----
    n_blocks = N_pad // 128
    qm = jnp.dot(queries, proj, preferred_element_type=jnp.float32)

    # phase-1 tile must divide N_pad: the largest CHUNK multiple <= 8
    # chunks that divides n_chunks
    _mult = max(m for m in range(1, 9) if n_chunks % m == 0)

    # tables passed as ARGUMENTS: closing over 10.5 GB of device arrays
    # makes XLA capture them as lowering constants (observed: the
    # "10.58GB of constants" warning + a compile that never returns)
    # one dispatch covers all B queries: QS-query slices run inside a
    # lax.scan (per-call relay latency is ~1s; per-slice dispatch would
    # make the artifact latency-bound, not device-bound)
    @partial(jax.jit, static_argnames=("blocks_k", "tile"))
    def search(qs_all, qm_all, aug, xi8, scales, xsq, blocks_k,
               tile=CHUNK * _mult):
        n_t = N_pad // tile

        def one_slice(_, qpair):
            qs, qm = qpair
            qa = jnp.zeros((QS, DP + 8), jnp.bfloat16)
            qa = qa.at[:, :DP].set(qm.astype(jnp.bfloat16))
            qa = qa.at[:, DP].set(1.0)

            def p1(_, t):
                blk = jax.lax.dynamic_slice(
                    aug, (t * tile, 0), (tile, DP + 8))
                d = jnp.dot(qa, blk.T, preferred_element_type=jnp.float32)
                return None, jnp.min(
                    d.reshape(QS, tile // 128, 128), axis=-1)

            _, mins = jax.lax.scan(p1, None,
                                   jnp.arange(n_t, dtype=jnp.int32))
            mins = jnp.moveaxis(mins, 0, 1).reshape(QS, n_blocks)
            _, bidx = jax.lax.approx_min_k(mins, blocks_k)   # [QS, C]

            # stage 2: int8 rerank of selected blocks
            rows = xi8.reshape(n_blocks, 128, DIM)[bidx]   # [QS,C,128,DIM]
            sc = scales.reshape(n_blocks, 128)[bidx]       # [QS, C, 128]
            xq = xsq.reshape(n_blocks, 128)[bidx]
            dots = jnp.einsum("qcbd,qd->qcb", rows.astype(jnp.bfloat16),
                              qs.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
            d = (xq - 2.0 * sc * dots
                 + jnp.sum(qs * qs, axis=1)[:, None, None])
            d = d.reshape(QS, -1)
            neg, pos = jax.lax.top_k(-d, K)
            ids = (bidx[:, :, None] * 128
                   + jnp.arange(128, dtype=jnp.int32)[None, None, :]
                   ).reshape(QS, -1)
            return None, (-neg, jnp.take_along_axis(ids, pos, axis=1))

        _, (dd, ii) = jax.lax.scan(
            one_slice, None,
            (qs_all.reshape(-1, QS, DIM), qm_all.reshape(-1, QS, DP)))
        return dd.reshape(-1, K), ii.reshape(-1, K)

    results = {"N": N, "dim": DIM, "dp": DP, "build_s": build_s,
               "memory_gb": {
                   "aug_bf16": round(N_pad * (DP + 8) * 2 / 1e9, 2),
                   "int8_mirror": round(N_pad * DIM / 1e9, 2),
               },
               "ops": []}
    for C in (16, 32, 64):
        d, ids = search(queries, qm, aug, xi8, scales, xsq, C)
        ids = np.asarray(ids)
        rec = float(np.mean([
            len(set(ids[i].tolist()) & set(gt[i].tolist())) / K
            for i in range(B)]))
        ts = []
        for r in range(3):
            qv = queries * (1.0 + (r + 1) * 1e-6)
            qmv = jnp.dot(qv, proj, preferred_element_type=jnp.float32)
            t0 = time.perf_counter()
            jax.block_until_ready(search(qv, qmv, aug, xi8, scales, xsq, C))
            ts.append(time.perf_counter() - t0)
        qps = B / float(np.median(ts))
        log(f"blocks_k={C}: recall@10={rec:.4f} qps={qps:.0f}")
        results["ops"].append({"blocks_k": C, "recall": rec, "qps": qps})

    Path("BENCH_10M.json").write_text(json.dumps(results, indent=2))
    log("wrote BENCH_10M.json")


if __name__ == "__main__":
    main()
