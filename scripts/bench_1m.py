#!/usr/bin/env python
"""1M x 768-d flagship benchmark (BASELINE.md config 4): every index mode
on one chip against the same exact-f32 ground truth.

Modes: exact f32 scan (recall 1.0), bf16 + hardware-top-k scan, HNSW beam,
HNSW-over-PQ (OPQ) hybrid, IVF-PQ (OPQ) with rerank. Data is clustered
("embedding-like", low intrinsic dim) unless BENCH_DATA=mog selects the
mixture-of-Gaussians generator. Writes BENCH_1M.json; progress to stderr.

Timing: warm >=3 varied-input calls first (first executions after compile
run ~4x slow through the relay; identical inputs are memoized).
"""

import json
import os
import random
import sys
import time
from pathlib import Path

import numpy as np

# allow running as `python scripts/<name>.py` without PYTHONPATH
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(run, q, n_q, reps=3):
    import jax

    for w in range(3):
        jax.block_until_ready(run(q * (1.0 + w * 1e-7)))
    t0 = time.perf_counter()
    for r in range(reps):
        jax.block_until_ready(run(q * (1.0 + (r + 1) * 1e-6)))
    return reps * n_q / (time.perf_counter() - t0)


def recall_of(ids, gt, k):
    return float(np.mean(
        [len(set(ids[i][:k].tolist()) & set(gt[i].tolist())) / k
         for i in range(len(gt))]
    ))


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vector_db_tpu.datasets import embedding_like
    from vector_db_tpu.index.hnsw import HNSW
    from vector_db_tpu.ops.exact import approx_search_tiled, exact_search_tiled

    N = int(os.environ.get("BENCH_N", 1_000_000))
    DIM, B, K = 768, 1000, 10
    # section gating (resume after a crash without re-timing everything):
    # BENCH_SECTIONS=widepq,ivf re-runs just those, merging into the
    # existing BENCH_1M.json (same N + data seed => same corpus/GT)
    SEC = set(os.environ.get("BENCH_SECTIONS", "all").split(","))

    def want(s):
        return "all" in SEC or s in SEC

    # corpus/graph/gt shared with the exp_* scripts via /tmp/wide1m_cache
    # (identical generator seed + build params). BENCH_1M_CACHE=0 forces
    # a fresh build — the only way to produce a new build_s headline.
    use_cache = os.environ.get("BENCH_1M_CACHE", "1") == "1"
    build_s = None
    if use_cache:
        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from exp_wide_1m import get_index

        index, x, q, gt = get_index(N, DIM, B)
        log("corpus/graph/gt from wide1m cache (BENCH_1M_CACHE=0 for a "
            "fresh build timing)")
    else:
        log(f"generating {N}x{DIM} (clustered embedding-like)...")
        t0 = time.perf_counter()
        data = embedding_like(N + B, DIM, 0)
        x, q = data[:N], data[N:]
        log(f"data {time.perf_counter() - t0:.0f}s")

        t0 = time.perf_counter()
        index = HNSW(M=16, ef_construction=200, rng=random.Random(42),
                     capacity=N, l_max=5)
        index.bulk_build(list(range(N)), x)
        jax.block_until_ready(index.graph.neighbors)
        build_s = time.perf_counter() - t0
        log(f"build: {build_s:.0f}s = {N / build_s:.0f} vec/s")

    qd = jnp.asarray(q)
    tile = 31250 if N % 31250 == 0 else 25000
    if not use_cache:
        t0 = time.perf_counter()
        gt = np.asarray(
            exact_search_tiled(qd, index._emb, index._has_emb, K,
                               tile=tile)[1]
        )
        log(f"exact gt: {time.perf_counter() - t0:.1f}s")

    results = {"N": N, "dim": DIM, "data": "clustered rank-64 embedding-like",
               "hnsw": [], "hnsw_opq": []}
    if build_s is not None:
        results.update({"build_s": build_s, "build_vps": N / build_s})
    prev_path = Path("BENCH_1M.json")
    if prev_path.exists():
        prev = json.loads(prev_path.read_text())
        if prev.get("N") == N:
            if build_s is None:
                # keep the previously measured fresh-build headline
                for kk in ("build_s", "build_vps"):
                    if kk in prev:
                        results[kk] = prev[kk]
            if "all" not in SEC:
                for kk in ("build_s", "build_vps"):
                    if kk in results:
                        prev[kk] = results[kk]
                results = prev
                log(f"resuming into existing BENCH_1M.json "
                    f"(sections: {SEC})")

    def save():
        prev_path.write_text(json.dumps(results, indent=2))

    if want("scan"):
        exact_qps = timed(
            lambda v: exact_search_tiled(v, index._emb, index._has_emb, K,
                                         tile=tile)[0], qd, B)
        log(f"exact f32 qps: {exact_qps:.0f} (recall 1.0)")
        results["exact_f32"] = {"qps": exact_qps, "recall": 1.0}

        # bf16 + hardware top-k scan
        emb16 = index._emb.astype(jnp.bfloat16)
        x_sq = jax.jit(lambda e: jnp.sum(e * e, -1))(index._emb)
        jax.block_until_ready((emb16, x_sq))
        tile16 = 125000 if N % 125000 == 0 else tile
        _, bf16_ids = approx_search_tiled(qd, emb16, index._has_emb, K,
                                          tile=tile16, x_sq=x_sq)
        bf16_rec = recall_of(np.asarray(bf16_ids), gt, K)
        bf16_qps = timed(
            lambda v: approx_search_tiled(v, emb16, index._has_emb, K,
                                          tile=tile16, x_sq=x_sq)[0], qd, B)
        log(f"bf16 scan qps: {bf16_qps:.0f} recall={bf16_rec:.4f}")
        results["bf16_scan"] = {"qps": bf16_qps, "recall": bf16_rec}

        # two-phase block-min scans (round 3): streaming block minima +
        # exact block rerank — extraction cost leaves the critical path
        from vector_db_tpu.ops.exact import block_select_search

        for name, tab, extra in [
            # exact block selection (round-3 fix): blocks_k=K is lossless,
            # so blocksel_exact is provably recall 1.0
            ("blocksel_exact", index._emb,
             {"exact_phase1": True, "blocks_k": K}),
            ("blocksel_bf16", emb16, {"blocks_k": 2 * K}),
            ("blocksel_bf16_k", emb16, {"blocks_k": K}),
        ]:
            # tile must be a multiple of block=128 (kernel pads N to tile)
            def run(v, tab=tab, extra=extra):
                return block_select_search(
                    v, tab, v, x_sq, index._emb, index._has_emb, K,
                    tile=131072, **extra)[0]

            _, ids = block_select_search(
                qd, tab, qd, x_sq, index._emb, index._has_emb, K,
                tile=131072, **extra)
            qps = timed(run, qd, B)
            rec = recall_of(np.asarray(ids), gt, K)
            log(f"{name}: recall={rec:.4f} qps={qps:.0f}")
            results[name] = {"qps": qps, "recall": rec}
        # projected phase-1 (PCA bf16 mirror, dims=128): 6x fewer
        # phase-1 bytes than the full bf16 table, and block-granular
        # rescoring absorbs projection noise far better than per-row
        # selection (a misranked ROW still gets exactly rescored as long
        # as its BLOCK survives) — the recall~1.0 throughput candidate
        # (VERDICT item 3: projected scan >=15k)
        t0 = time.perf_counter()
        index.enable_rp(dims=128)
        rp_tab, rp_xsq = index._rp_tables()
        jax.block_until_ready(rp_tab)
        log(f"enable_rp + mirror: {time.perf_counter() - t0:.0f}s")
        proj = index._rp_proj
        for name, bk in [("blocksel_proj_k", K), ("blocksel_proj", 2 * K),
                         ("blocksel_proj_4k", 4 * K)]:
            def run(v, bk=bk):
                qp = jnp.dot(v, proj, preferred_element_type=jnp.float32)
                return block_select_search(
                    v, rp_tab, qp, rp_xsq, index._emb, index._has_emb, K,
                    tile=131072, blocks_k=bk)[0]

            qp = jnp.dot(qd, proj, preferred_element_type=jnp.float32)
            _, ids = block_select_search(
                qd, rp_tab, qp, rp_xsq, index._emb, index._has_emb, K,
                tile=131072, blocks_k=bk)
            qps = timed(run, qd, B)
            rec = recall_of(np.asarray(ids), gt, K)
            log(f"{name}: recall={rec:.4f} qps={qps:.0f}")
            results[name] = {"qps": qps, "recall": rec}

        # the scan mirrors are dead past this point; at 1M x 768 the
        # bf16 copy (1.5 GB) is the margin the PQ-wide section OOMed on
        del emb16, x_sq, bf16_ids
        save()

    if want("scan3p"):
        # three-phase block-select over the PCA-128 bf16 mirror with the
        # fused Pallas block-min phase-1 kernel — the recall-1.0
        # throughput winner (EXP_BLOCKSEL 3pp_proj128_bk20_r80: 17.5k
        # QPS; bench.py serves the same config as its headline row)
        from vector_db_tpu.ops.exact import block_select_search_3p

        x_sq = jax.jit(lambda e: jnp.sum(e * e, -1))(index._emb)
        index.enable_rp(dims=128)
        rp_tab, _ = index._rp_tables()
        proj = index._rp_proj
        jax.block_until_ready((rp_tab, x_sq))

        def run_3p(v):
            qp = jnp.dot(v, proj, preferred_element_type=jnp.float32)
            return block_select_search_3p(
                v, rp_tab, qp, x_sq, index._emb, index._has_emb, K,
                tile=131072, blocks_k=2 * K, rows_k=8 * K,
                pallas_phase1=True)[0]

        qp = jnp.dot(qd, proj, preferred_element_type=jnp.float32)
        _, ids = block_select_search_3p(
            qd, rp_tab, qp, x_sq, index._emb, index._has_emb, K,
            tile=131072, blocks_k=2 * K, rows_k=8 * K, pallas_phase1=True)
        qps = timed(run_3p, qd, B)
        rec = recall_of(np.asarray(ids), gt, K)
        log(f"blocksel_3p: recall={rec:.4f} qps={qps:.0f}")
        results["blocksel_3p"] = {"qps": qps, "recall": rec}
        del x_sq, rp_tab
        save()

    if want("scan2p"):
        # two-phase fused per-block top-m kernel (round 5) — the
        # recall-1.0 headline: the Pallas scan emits the m best rows per
        # 128-row block directly, collapsing the 3p pipeline's select +
        # mirror-gather + rescore stages (EXP_2P.json: 73.0k piped QPS)
        from vector_db_tpu.ops.exact import block_select_search_2p

        x_sq = jax.jit(lambda e: jnp.sum(e * e, -1))(index._emb)
        index.enable_rp(dims=128)
        rp_tab, _ = index._rp_tables()
        proj = index._rp_proj
        jax.block_until_ready((rp_tab, x_sq))

        def run_2p(v):
            qp = jnp.dot(v, proj, preferred_element_type=jnp.float32)
            return block_select_search_2p(
                v, rp_tab, qp, x_sq, index._emb, index._has_emb, K,
                block=128, m=2, rows_k=8 * K)[0]

        qp = jnp.dot(qd, proj, preferred_element_type=jnp.float32)
        _, ids = block_select_search_2p(
            qd, rp_tab, qp, x_sq, index._emb, index._has_emb, K,
            block=128, m=2, rows_k=8 * K)
        qps = timed(run_2p, qd, B)
        rec = recall_of(np.asarray(ids), gt, K)
        log(f"blocksel_2p: recall={rec:.4f} qps={qps:.0f}")
        results["blocksel_2p"] = {"qps": qps, "recall": rec}
        del x_sq, rp_tab
        save()

    # wide-beam graph mode (round 3): frontier-parallel traversal with
    # inline neighbor blocks (inline tables are 2M*dims B/row — only
    # built when the exact-wide section runs; PQ-wide doesn't use them)
    if want("wide") or want("widepq"):
        t0 = time.perf_counter()
        index.enable_wide(dims=120, seeds=16384, inline=want("wide"))
        log(f"enable_wide: {time.perf_counter() - t0:.0f}s")
    if want("wide"):
        index.search_batch_wide(q[:8], k=K, ef=64, frontier=16, steps=4)
        results["hnsw_wide"] = []
        # seen=False rows are the measured pareto (EXP_WIDE.json): the
        # window dedup alone suffices; dropping the pool-membership
        # compare buys ~25% QPS for <=0.5 recall points. The T=8/F=256
        # and T=9 rows are the round-3 winners (EXP_WIDE_FINAL: >=0.95
        # recall at >=1k QPS)
        for ef, F, T, seen in [(1024, 160, 10, False), (1280, 256, 8, False),
                               (1280, 224, 9, False), (1280, 224, 10, False),
                               (1280, 224, 10, True)]:
            def run(v, ef=ef, F=F, T=T, seen=seen):
                return index.search_batch_wide(np.asarray(v), k=K, ef=ef,
                                               frontier=F, steps=T,
                                               seen_mask=seen)[0]

            _, ids = index.search_batch_wide(q, k=K, ef=ef, frontier=F,
                                             steps=T, seen_mask=seen)
            qps = timed(run, qd, B)
            rec = recall_of(ids, gt, K)
            log(f"hnsw-wide ef={ef} F={F} T={T} seen={seen}: "
                f"recall={rec:.3f} qps={qps:.0f}")
            results["hnsw_wide"].append(
                {"ef": ef, "F": F, "T": T, "seen": seen, "recall": rec,
                 "qps": qps})
        save()

    if want("beam"):
        # pool-free beam traversal (merge-light wide-beam variant)
        if not hasattr(index, "_wb_n_seeds"):
            index.enable_wide(dims=120, seeds=16384, inline=True)
        index.search_batch_beam(q[:8], k=K, frontier=16, steps=4)
        results["hnsw_beam"] = []
        for F, T, H in [(224, 12, 2), (256, 14, 2), (320, 12, 2)]:
            def run(v, F=F, T=T, H=H):
                return index.search_batch_beam(np.asarray(v), k=K,
                                               frontier=F, steps=T,
                                               hist=H)[0]

            _, ids = index.search_batch_beam(q, k=K, frontier=F, steps=T,
                                             hist=H)
            qps = timed(run, qd, B)
            rec = recall_of(ids, gt, K)
            log(f"hnsw-beam F={F} T={T} hist={H}: "
                f"recall={rec:.3f} qps={qps:.0f}")
            results["hnsw_beam"].append(
                {"F": F, "T": T, "hist": H, "recall": rec, "qps": qps})
        save()

    if want("hnsw"):
        results["hnsw"] = []
        for ef in [200, 400]:
            def run(v, ef=ef):
                return index.search_batch(np.asarray(v), k=K, ef=ef,
                                          expand=4)[0]

            _, ids = index.search_batch(q, k=K, ef=ef, expand=4)
            qps = timed(run, qd, B)
            rec = recall_of(ids, gt, K)
            log(f"hnsw ef={ef}: recall={rec:.3f} qps={qps:.0f}")
            results["hnsw"].append({"ef": ef, "recall": rec, "qps": qps})
        save()

    if want("filter"):
        # filtered serving: classic two-pool beam vs the filtered wide
        # path (two-pool wide-beam) at 10% and 2% random filter sets.
        # Round-4 addition (VERDICT #4): the widened (ef 1536 /
        # rerank_k 512) wide config — selective filters need a deep
        # result pool to keep >=0.95
        from vector_db_tpu.ops.exact import exact_search_tiled

        if not hasattr(index, "_wb_n_seeds"):
            index.enable_wide(dims=120, seeds=16384, inline=True)
        results["hnsw_filtered"] = []
        for sel in (0.1, 0.02):
            rngf = np.random.default_rng(11)
            fslots = rngf.choice(N, size=int(N * sel), replace=False)
            filt = set(int(i) for i in fslots)  # slot==id in this bench
            fmask = np.zeros((index._capacity,), bool)
            fmask[fslots] = True
            vmask = jnp.asarray(fmask) & index._has_emb
            gt_f = np.asarray(exact_search_tiled(
                qd, index._emb, vmask, K, tile=31250)[1])
            rows = [
                # serving default (index.filtered_engine: scan): masked
                # bf16 scan — true filtered top-k at scan QPS
                ("scan", lambda v: index.search_batch_scan(
                    np.asarray(v), k=K, filter_ids=filt)),
                ("scan_exact", lambda v: index.search_batch_scan(
                    np.asarray(v), k=K, mode="exact", filter_ids=filt)),
                ("wide", lambda v: index.search_batch_wide(
                    np.asarray(v), k=K, ef=1280, frontier=224, steps=10,
                    rerank_k=256, seen_mask=False, filter_ids=filt)),
                ("wide_deep", lambda v: index.search_batch_wide(
                    np.asarray(v), k=K, ef=1536, frontier=224, steps=12,
                    rerank_k=512, seen_mask=False, filter_ids=filt)),
                ("classic", lambda v: index.search_batch(
                    np.asarray(v), k=K, ef=400, expand=4,
                    filter_ids=filt)),
            ]
            if sel != 0.1:  # classic at 2% is minutes/batch; skip
                rows = [r for r in rows if r[0] != "classic"]
            for name, run_f in rows:
                _, ids = run_f(q)
                qps = timed(lambda v: run_f(v)[0], qd, B)
                rec = recall_of(ids, gt_f, K)
                log(f"hnsw-filtered sel={sel} {name}: recall={rec:.3f} "
                    f"qps={qps:.0f}")
                results["hnsw_filtered"].append(
                    {"engine": name, "selectivity": sel, "recall": rec,
                     "qps": qps})
                save()

    if want("rp"):
        # projected traversal (pHNSW-style): PCA-128 bf16 mirror beam
        t0 = time.perf_counter()
        index.enable_rp(dims=128)
        index.search_batch_rp(q[:8], k=K, ef=16)  # build mirror
        log(f"hnsw enable_rp: {time.perf_counter() - t0:.0f}s")
        results["hnsw_rp"] = []
        for ef in [200, 400, 600]:
            def run(v, ef=ef):
                return index.search_batch_rp(np.asarray(v), k=K, ef=ef,
                                             expand=4)[0]

            _, ids = index.search_batch_rp(q, k=K, ef=ef, expand=4)
            qps = timed(run, qd, B)
            rec = recall_of(ids, gt, K)
            log(f"hnsw-rp ef={ef}: recall={rec:.3f} qps={qps:.0f}")
            results["hnsw_rp"].append({"ef": ef, "recall": rec, "qps": qps})
        save()

    if want("opq") or want("widepq"):
        t0 = time.perf_counter()
        index.enable_pq(chunks=16, ksub=256, opq_iters=8)
        log(f"enable_pq(opq): {time.perf_counter() - t0:.0f}s")
        if want("opq") and want("widepq"):
            results["hnsw_opq"] = []
    for ef in ([400] if want("opq") else []):
        def run(v, ef=ef):
            return index.search_batch_pq(np.asarray(v), k=K, ef=ef,
                                         expand=4)[0]

        _, ids = index.search_batch_pq(q, k=K, ef=ef, expand=4)
        qps = timed(run, qd, B)
        rec = recall_of(ids, gt, K)
        log(f"hnsw-opq ef={ef}: recall={rec:.3f} qps={qps:.0f}")
        results["hnsw_opq"].append({"ef": ef, "recall": rec, "qps": qps})

    # HNSW-over-PQ with wide-beam mechanics (round 3): ADC-scored
    # traversal from the PQ-decoded mirror, full-pool exact rerank
    for ef, F, T in ([(1536, 256, 10), (2048, 320, 10)]
                     if want("widepq") else []):
        def run(v, ef=ef, F=F, T=T):
            return index.search_batch_wide(
                np.asarray(v), k=K, ef=ef, frontier=F, steps=T,
                score="pq", rerank_k=ef)[0]

        _, ids = index.search_batch_wide(q, k=K, ef=ef, frontier=F,
                                         steps=T, score="pq", rerank_k=ef)
        qps = timed(run, qd, B)
        rec = recall_of(ids, gt, K)
        log(f"hnsw-opq-wide ef={ef}: recall={rec:.3f} qps={qps:.0f}")
        results["hnsw_opq"].append(
            {"ef": ef, "F": F, "T": T, "mode": "wide", "recall": rec,
             "qps": qps})
    save()

    if not want("ivf"):
        log(json.dumps(results))
        return

    # ---- IVF modes: the scale-path ANN story ----
    # free the HNSW tables first (graph + PQ mirrors); the IVF index owns
    # its own device table and both don't fit 16G HBM at 1M x 768
    del index
    import gc
    gc.collect()

    from vector_db_tpu.index.ivf import IvfIndex

    n_cells = int(os.environ.get("BENCH_IVF_K", 4096))
    spill = int(os.environ.get("BENCH_IVF_SPILL", 2))
    t0 = time.perf_counter()
    ivf = IvfIndex(k=n_cells)
    ivf.build_arrays(range(N), x, seed=0, iters=20, spill=spill,
                     list_cap_alpha=2.0)
    ivf_build_s = time.perf_counter() - t0
    log(f"ivf build (k={n_cells}, spill={spill}): {ivf_build_s:.0f}s")

    # coarse-probe recall ceiling (host-side): what any in-cell scoring
    # can at best achieve — separates quantizer loss from cell selection
    cell_of = [[] for _ in range(N)]
    for c, lst in enumerate(ivf.inverted_lists):
        for nid in lst:
            cell_of[nid].append(c)
    cents = ivf.centroids
    cdh = (cents * cents).sum(-1)[None, :] - 2.0 * (q @ cents.T)
    order = np.argsort(cdh, axis=1)
    probe_ceiling = {}
    for n_probe in [64, 128, 256]:
        probed = [set(order[i, :n_probe].tolist()) for i in range(B)]
        probe_ceiling[n_probe] = float(np.mean(
            [[bool(set(cell_of[g]) & probed[i]) for g in gt[i]]
             for i in range(B)]
        ))
        log(f"probe ceiling n_probe={n_probe}: {probe_ceiling[n_probe]:.4f}")

    # residual-projection bf16 scoring (gather-free, MXU-native)
    t0 = time.perf_counter()
    ivf.enable_rp(dims=int(os.environ.get("BENCH_RP_DIMS", 128)))
    ivf.search_batch(q[:8], n_probe=8, top_k=K, rp=True)  # build cells
    log(f"ivf enable_rp: {time.perf_counter() - t0:.0f}s")
    results["ivf_rp"] = {"k_cells": n_cells, "spill": spill,
                         "build_s": ivf_build_s,
                         "probe_ceiling": probe_ceiling, "ops": []}
    for n_probe, fetch in [(64, 128), (256, 256), (n_cells, 64)]:
        def run(v, n_probe=n_probe, fetch=fetch):
            return ivf.search_batch(np.asarray(v), n_probe=n_probe,
                                    top_k=K, rp=True, fetch=fetch)[0]

        _, ids = ivf.search_batch(q, n_probe=n_probe, top_k=K, rp=True,
                                  fetch=fetch)
        qps = timed(run, qd, B)
        rec = recall_of(ids, gt, K)
        log(f"ivf-rp n_probe={n_probe} fetch={fetch}: recall={rec:.3f} "
            f"qps={qps:.0f}")
        results["ivf_rp"]["ops"].append(
            {"n_probe": n_probe, "fetch": fetch, "recall": rec, "qps": qps}
        )

    Path("BENCH_1M.json").write_text(json.dumps(results, indent=2))
    log(json.dumps(results))


if __name__ == "__main__":
    main()
