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
            bd, bi, fd_c, fi_c = carry
            x = gen(jax.random.fold_in(k_chunks, ci), CHUNK)
            gids = ci * CHUNK + jnp.arange(CHUNK)
            row_ok = gids < N
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
            # filtered GT fold (metadata-filter analog: allow ids%10==0,
            # the reference's filter-navigates-but-excludes contract at
            # 10% selectivity — hnsw.py:96-97,127-131)
            d_f = jnp.where((gids % 10 == 0)[None, :], d, 3e38)
            nfd, fpos = jax.lax.top_k(-d_f, K)
            fids = ci * CHUNK + fpos
            mfd, mfi = jax.lax.top_k(
                jnp.concatenate([-fd_c, nfd], axis=1), K)
            mfids = jnp.take_along_axis(
                jnp.concatenate([fi_c, fids], axis=1), mfi, axis=1)
            # aug mirror row
            xm = jnp.dot(x, proj, preferred_element_type=jnp.float32)
            aug = jnp.zeros((CHUNK, DP + 8), jnp.bfloat16)
            aug = aug.at[:, :DP].set((-2.0 * xm).astype(jnp.bfloat16))
            aug = aug.at[:, DP].set(xsq.astype(jnp.bfloat16))
            # int8 full-dim mirror
            scale = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-9) / 127.0
            xi8 = jnp.round(x / scale[:, None]).astype(jnp.int8)
            return ((-md, mids, -mfd, mfids),
                    (aug, xi8, scale.astype(jnp.float32),
                     jnp.where(row_ok, jnp.sum(x * x, axis=1), 3e38)))

        init = (jnp.full((B, K), 3e38, jnp.float32),
                jnp.full((B, K), -1, jnp.int32),
                jnp.full((B, K), 3e38, jnp.float32),
                jnp.full((B, K), -1, jnp.int32))
        (gd, gi, gfd, gfi), (aug, xi8, scales, xsq) = jax.lax.scan(
            body, init, jnp.arange(n_chunks, dtype=jnp.int32))
        return (gd, gi, gfi, aug.reshape(N_pad, DP + 8),
                xi8.reshape(N_pad, DIM), scales.reshape(N_pad),
                xsq.reshape(N_pad))

    log(f"building 10M tables on device ({n_chunks} chunks)...")
    t0 = time.perf_counter()
    gd, gt, gt_f, aug, xi8, scales, xsq = build_all(queries)
    jax.block_until_ready(aug)
    build_s = time.perf_counter() - t0
    log(f"gen+gt+mirrors: {build_s:.0f}s")
    gt = np.asarray(gt)
    gt_f = np.asarray(gt_f)

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
    @partial(jax.jit, static_argnames=("blocks_k", "tile", "qslice",
                                       "filtered"))
    def search(qs_all, qm_all, aug, xi8, scales, xsq, msk, blocks_k,
               tile=CHUNK * _mult, qslice=QS, filtered=False):
        n_t = N_pad // tile

        def one_slice(_, qpair):
            qs, qm = qpair
            qn = qs.shape[0]
            qa = jnp.zeros((qn, DP + 8), jnp.bfloat16)
            qa = qa.at[:, :DP].set(qm.astype(jnp.bfloat16))
            qa = qa.at[:, DP].set(1.0)

            def p1(_, t):
                blk = jax.lax.dynamic_slice(
                    aug, (t * tile, 0), (tile, DP + 8))
                d = jnp.dot(qa, blk.T, preferred_element_type=jnp.float32)
                if filtered:
                    pen = jax.lax.dynamic_slice(msk, (t * tile,), (tile,))
                    d = d + pen[None, :]
                return None, jnp.min(
                    d.reshape(qn, tile // 128, 128), axis=-1)

            _, mins = jax.lax.scan(p1, None,
                                   jnp.arange(n_t, dtype=jnp.int32))
            mins = jnp.moveaxis(mins, 0, 1).reshape(qn, n_blocks)
            _, bidx = jax.lax.approx_min_k(mins, blocks_k)   # [qn, C]

            # stage 2: int8 rerank of selected blocks
            rows = xi8.reshape(n_blocks, 128, DIM)[bidx]   # [qn,C,128,DIM]
            sc = scales.reshape(n_blocks, 128)[bidx]       # [qn, C, 128]
            xq = xsq.reshape(n_blocks, 128)[bidx]
            dots = jnp.einsum("qcbd,qd->qcb", rows.astype(jnp.bfloat16),
                              qs.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
            d = (xq - 2.0 * sc * dots
                 + jnp.sum(qs * qs, axis=1)[:, None, None])
            if filtered:
                d = d + msk.reshape(n_blocks, 128)[bidx]
            d = d.reshape(qn, -1)
            neg, pos = jax.lax.top_k(-d, K)
            ids = (bidx[:, :, None] * 128
                   + jnp.arange(128, dtype=jnp.int32)[None, None, :]
                   ).reshape(qn, -1)
            return None, (-neg, jnp.take_along_axis(ids, pos, axis=1))

        _, (dd, ii) = jax.lax.scan(
            one_slice, None,
            (qs_all.reshape(-1, qslice, DIM),
             qm_all.reshape(-1, qslice, DP)))
        return dd.reshape(-1, K), ii.reshape(-1, K)

    # filter penalty table: 0 where allowed (global id % 10 == 0), else
    # +3e38 — folded into phase 1 AND the stage-2 rerank so excluded rows
    # never surface (reference filter semantics, hnsw.py:96-97,127-131)
    gids_all = jnp.arange(N_pad, dtype=jnp.int32)
    msk_pen = jnp.where((gids_all % 10 == 0) & (gids_all < N),
                        0.0, 3.0e38).astype(jnp.float32)

    results = {"N": N, "dim": DIM, "dp": DP, "build_s": build_s,
               "memory_gb": {
                   "aug_bf16": round(N_pad * (DP + 8) * 2 / 1e9, 2),
                   "int8_mirror": round(N_pad * DIM / 1e9, 2),
               },
               "ops": []}
    def save():
        Path("BENCH_10M.json").write_text(json.dumps(results, indent=2))

    def recall_vs(ids, oracle):
        return float(np.mean([
            len(set(ids[i].tolist()) & set(oracle[i].tolist())) / K
            for i in range(len(oracle))]))

    op_qps = {}
    for C in (8, 16, 32, 64):
        d, ids = search(queries, qm, aug, xi8, scales, xsq, msk_pen, C)
        rec = recall_vs(np.asarray(ids), gt)
        ts = []
        for r in range(3):
            qv = queries * (1.0 + (r + 1) * 1e-6)
            qmv = jnp.dot(qv, proj, preferred_element_type=jnp.float32)
            t0 = time.perf_counter()
            jax.block_until_ready(
                search(qv, qmv, aug, xi8, scales, xsq, msk_pen, C))
            ts.append(time.perf_counter() - t0)
        qps = B / float(np.median(ts))
        op_qps[C] = (rec, qps)
        log(f"blocks_k={C}: recall@10={rec:.4f} qps={qps:.0f}")
        results["ops"].append({"blocks_k": C, "recall": rec, "qps": qps})
        save()

    # ---- routed operating point: calibrate on the first half of the
    # query set (smallest blocks_k reaching >=0.95), report on the held-
    # out half — the autotune contract (services/autotune.py) applied to
    # the 10M mode ladder
    target = 0.95
    cal_n = B // 2
    routed = None
    for C in (8, 16, 32, 64):
        _, ids = search(queries[:cal_n], qm[:cal_n], aug, xi8, scales,
                        xsq, msk_pen, C, qslice=cal_n)
        if recall_vs(np.asarray(ids), gt[:cal_n]) >= target:
            routed = C
            break
    routed = routed or 64
    _, ids = search(queries[cal_n:], qm[cal_n:], aug, xi8, scales, xsq,
                    msk_pen, routed, qslice=B - cal_n)
    results["routed"] = {
        "target": target, "blocks_k": routed,
        "holdout_recall": recall_vs(np.asarray(ids), gt[cal_n:]),
        "qps": op_qps.get(routed, (None, None))[1],
    }
    log(f"routed: blocks_k={routed} holdout_recall="
        f"{results['routed']['holdout_recall']:.4f}")
    save()

    # ---- sustained throughput at the routed point (queue depth 8) ----
    ts = []
    for r in range(3):
        vs = [(queries * (1.0 + (r * 8 + i + 1) * 1e-6)) for i in range(8)]
        vms = [jnp.dot(v, proj, preferred_element_type=jnp.float32)
               for v in vs]
        t0 = time.perf_counter()
        outs = [search(v, vm, aug, xi8, scales, xsq, msk_pen, routed)
                for v, vm in zip(vs, vms)]
        jax.block_until_ready(outs)
        ts.append(time.perf_counter() - t0)
    results["sustained_d8"] = {
        "blocks_k": routed, "qps": 8 * B / float(np.median(ts)),
        "recall": op_qps.get(routed, (None,))[0],
    }
    log(f"sustained d8: {results['sustained_d8']['qps']:.0f} qps")
    save()

    # ---- filtered search (10% selectivity) vs filtered exact GT ----
    _, fids = search(queries, qm, aug, xi8, scales, xsq, msk_pen, routed,
                     filtered=True)
    fids_np = np.asarray(fids)
    assert (np.asarray(fids_np) % 10 == 0).all(), "filter leaked"
    frec = recall_vs(fids_np, gt_f)
    ts = []
    for r in range(3):
        qv = queries * (1.0 + (r + 1) * 1e-6)
        qmv = jnp.dot(qv, proj, preferred_element_type=jnp.float32)
        t0 = time.perf_counter()
        jax.block_until_ready(search(qv, qmv, aug, xi8, scales, xsq,
                                     msk_pen, routed, filtered=True))
        ts.append(time.perf_counter() - t0)
    results["filtered_10pct"] = {
        "blocks_k": routed, "recall": frec,
        "qps": B / float(np.median(ts)),
    }
    log(f"filtered(10%): recall={frec:.4f} "
        f"qps={results['filtered_10pct']['qps']:.0f}")
    save()

    # ---- small-batch latency (B=1 / B=8): wall per call + RTT-floor
    # subtracted device estimate (relay RTT dominates single dispatches;
    # methodology of BENCH_LATENCY.json) ----
    tiny = jax.jit(lambda v: jnp.sum(v * v))
    tiny(queries[0]).block_until_ready()
    rts = []
    for _ in range(15):
        t0 = time.perf_counter()
        tiny(queries[0]).block_until_ready()
        rts.append(time.perf_counter() - t0)
    rtt_ms = float(np.median(rts)) * 1e3
    results["latency"] = {"rtt_floor_ms": round(rtt_ms, 2), "rows": []}
    for nb in (1, 8):
        qv, qmv = queries[:nb], qm[:nb]
        _, lid = search(qv, qmv, aug, xi8, scales, xsq, msk_pen, routed,
                        qslice=nb)
        lrec = recall_vs(np.asarray(lid), gt[:nb])
        ws = []
        for r in range(20):
            v = queries[:nb] * (1.0 + (r + 1) * 1e-6)
            vm = jnp.dot(v, proj, preferred_element_type=jnp.float32)
            t0 = time.perf_counter()
            jax.block_until_ready(search(v, vm, aug, xi8, scales, xsq,
                                         msk_pen, routed, qslice=nb))
            ws.append((time.perf_counter() - t0) * 1e3)
        wall = float(np.median(ws))
        row = {"B": nb, "blocks_k": routed, "recall_sample": lrec,
               "wall_ms": round(wall, 2),
               "device_ms_est": round(max(wall - rtt_ms, 0.0), 2)}
        results["latency"]["rows"].append(row)
        log(f"latency B={nb}: wall {wall:.1f} ms "
            f"(dev est {row['device_ms_est']:.1f} ms)")
    save()
    log("wrote BENCH_10M.json")


if __name__ == "__main__":
    main()
