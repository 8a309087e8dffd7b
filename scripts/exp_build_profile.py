#!/usr/bin/env python
"""Stage-attributed timing of the 1M x 768 bulk build (VERDICT r5 #4:
README claims 1.9-2.5k vps, BENCH_1M says 810 — find where the time
goes, then optimize to >=2.5k vps).

Replays the exact _clustered_forward pipeline (index/hnsw.py) stage by
stage on the cached 1M corpus with block_until_ready fences between
stages, then runs the real bulk_build end-to-end for the total. Writes
EXP_BUILD_PROFILE.json.
"""

import json
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CACHE = Path("/tmp/wide1m_cache")
N, DIM = 1_000_000, 768


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vector_db_tpu.ops.graph_build import (
        assign_topk_clusters,
        clustered_knn_merge,
        nn_descent_round,
    )
    from vector_db_tpu.ops.kmeans import kmeans
    from vector_db_tpu.runtime import device_pull

    from vector_db_tpu.datasets import embedding_like

    B = 1000
    dpath = CACHE / "data.npy"
    if not dpath.exists():  # bootstrap the shared wide1m cache
        log(f"generating {N + B}x{DIM} (device) ...")
        CACHE.mkdir(exist_ok=True)
        np.save(dpath, embedding_like(N + B, DIM, 0))
    data = np.load(dpath, mmap_mode="r")
    embeddings = np.asarray(data[:N])
    out = {"N": N, "dim": DIM, "stages": []}

    def stage(label, fn):
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r) if hasattr(r, "block_until_ready") or \
            isinstance(r, tuple) else None
        dt = time.perf_counter() - t0
        out["stages"].append({"stage": label, "s": round(dt, 2)})
        log(f"{label}: {dt:.1f}s")
        Path("EXP_BUILD_PROFILE.json").write_text(json.dumps(out, indent=1))
        return r

    deg, spill, seed = 32, 3, 0
    c = max(64, 1 << int(round(math.log2(math.sqrt(N)))))
    rng = np.random.default_rng(seed)

    t0 = time.perf_counter()
    sample = embeddings[rng.choice(N, 131072, replace=False)]
    sample_dev = jnp.asarray(sample)
    jax.block_until_ready(sample_dev)
    out["stages"].append(
        {"stage": "host_sample+h2d", "s": round(time.perf_counter() - t0, 2)})

    cents = stage("kmeans_15it", lambda: kmeans(
        sample_dev, c, jax.random.key(seed), iters=15)[0])

    chunk = 8192
    pad = (-N) % chunk
    t0 = time.perf_counter()
    emb_pad = np.zeros((N + pad, DIM), np.float32)
    emb_pad[:N] = embeddings
    emb_dev = jnp.asarray(emb_pad)
    jax.block_until_ready(emb_dev)
    out["stages"].append(
        {"stage": "corpus_h2d", "s": round(time.perf_counter() - t0, 2)})

    assign = stage("assign_topk", lambda: assign_topk_clusters(
        emb_dev, cents, k=spill, chunk=chunk))
    t0 = time.perf_counter()
    assign = device_pull(assign)[:N]
    cl = assign.T.reshape(-1).astype(np.int64)
    pt = np.tile(np.arange(N, dtype=np.int32), spill)
    order = np.argsort(cl, kind="stable")
    cl_s, pt_s = cl[order], pt[order]
    starts = np.searchsorted(cl_s, np.arange(c))
    ranks = np.arange(cl_s.size) - starts[cl_s]
    lmax = int(ranks.max()) + 1 if ranks.size else 1
    lmax = min(max(256, lmax), 8192)
    lmax = ((lmax + 255) // 256) * 256
    keep = ranks < lmax
    members = np.full((c, lmax), -1, np.int32)
    members[cl_s[keep], ranks[keep]] = pt_s[keep]
    out["stages"].append(
        {"stage": "member_table_host", "s": round(time.perf_counter() - t0, 2),
         "c": int(c), "lmax": int(lmax)})
    log(f"member_table: c={c} lmax={lmax}")

    members_dev = jnp.asarray(members)
    fwd = stage("clustered_knn_merge",
                lambda: clustered_knn_merge(emb_dev, members_dev, deg))
    fwd_d, fwd_i = fwd

    nd_sample = max(4, min(8, deg // 2))
    nd_chunk = 2048 if deg * nd_sample <= 128 else 1024
    for r in range(2):
        fwd_d, fwd_i = stage(
            f"nn_descent_round_{r}",
            lambda: nn_descent_round(emb_dev, fwd_d, fwd_i, deg,
                                     chunk=nd_chunk, sample=nd_sample))

    t0 = time.perf_counter()
    fd = device_pull(fwd_d[:N])
    fi = device_pull(fwd_i[:N])
    out["stages"].append(
        {"stage": "edges_d2h", "s": round(time.perf_counter() - t0, 2)})

    from vector_db_tpu.index.hnsw import _reverse_merge

    t0 = time.perf_counter()
    _rows = _reverse_merge(fi, fd, 2 * 16)
    out["stages"].append(
        {"stage": "reverse_merge_host", "s": round(time.perf_counter() - t0, 2)})

    out["stage_total_s"] = round(sum(s["s"] for s in out["stages"]), 1)
    log(f"stage total: {out['stage_total_s']}s")
    Path("EXP_BUILD_PROFILE.json").write_text(json.dumps(out, indent=1))

    # end-to-end bulk_build for the real total (includes upper levels +
    # graph assembly). Same params as exp_wide_1m.get_index, and the
    # result is saved into the shared cache so downstream scripts
    # (exp_2p, bench_1m cached mode, exp_latency_device) skip the build.
    import random

    from vector_db_tpu.index.hnsw import HNSW

    t0 = time.perf_counter()
    index = HNSW(M=16, ef_construction=200, rng=random.Random(42),
                 capacity=N, l_max=5)
    index.bulk_build(list(range(N)), embeddings)
    jax.block_until_ready(index.graph.neighbors)
    total = time.perf_counter() - t0
    out["bulk_build_total_s"] = round(total, 1)
    out["bulk_build_vps"] = round(N / total)
    log(f"bulk_build total: {total:.0f}s ({N / total:.0f} vps)")
    Path("EXP_BUILD_PROFILE.json").write_text(json.dumps(out, indent=1))

    gpath = CACHE / "graph.npz"
    if not gpath.exists():
        np.savez(gpath,
                 neighbors=device_pull(index.graph.neighbors),
                 levels=device_pull(index.graph.levels),
                 entry=device_pull(index.graph.entry),
                 entry_level=device_pull(index.graph.entry_level))
        log("graph cached")
    gt_path = CACHE / "gt.npy"
    if not gt_path.exists():
        from vector_db_tpu.ops.exact import exact_search_tiled

        q = jnp.asarray(np.asarray(data[N:]))
        gt = device_pull(exact_search_tiled(
            q, index._emb, index._has_emb, 10, tile=31250)[1])
        np.save(gt_path, gt)
        log("gt cached")


if __name__ == "__main__":
    main()
