#!/usr/bin/env python
"""Wide-beam operating-point sweep at 1M x 768 on the real chip.

Builds (or reloads from /tmp/wide1m_cache) the standard flagship index
(clustered embedding-like corpus, M=16, efc=200 — same as bench_1m), then
sweeps wide-beam (ef, F, T) against exact ground truth. Writes
EXP_WIDE.json. Usage: python scripts/exp_wide_1m.py [sweep|quick]
"""

import json
import os
import random
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CACHE = Path("/tmp/wide1m_cache")


def cache_for(n: int) -> Path:
    """Per-N cache dir: cross-N runs must never clobber the
    expensive 1M corpus/graph artifacts."""
    return CACHE if n == 1_000_000 else Path(f"{CACHE}_{n}")


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(run, q, n_q, reps=3):
    import jax

    for w in range(2):
        jax.block_until_ready(run(q * (1.0 + w * 1e-7)))
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(q * (1.0 + (r + 1) * 1e-6)))
        ts.append(time.perf_counter() - t0)
    return n_q / float(np.median(ts))


def recall_of(ids, gt, k):
    return float(np.mean(
        [len(set(ids[i][:k].tolist()) & set(gt[i].tolist())) / k
         for i in range(len(gt))]
    ))


def get_index(N, DIM, B):
    import jax
    import jax.numpy as jnp

    from vector_db_tpu.datasets import embedding_like
    from vector_db_tpu.index import hnsw_kernels as K
    from vector_db_tpu.index.hnsw import HNSW

    cache = cache_for(N)
    dpath = cache / "data.npy"
    if dpath.exists():
        log("loading cached corpus...")
        data = np.load(dpath, mmap_mode="r")
        if data.shape != (N + B, DIM):  # stale cache from a different N
            log(f"cache shape {data.shape} != {(N + B, DIM)}; regenerating")
            data = None
        else:
            data = np.asarray(data)
    else:
        data = None
    if data is None:
        log(f"generating {N}x{DIM}...")
        data = embedding_like(N + B, DIM, 0)
        cache.mkdir(exist_ok=True)
        np.save(dpath, data)
        # downstream caches derive from the corpus: drop them with it
        for stale in cache.glob("graph*.npz"):
            stale.unlink()
        (cache / "gt.npy").unlink(missing_ok=True)
    x, q = data[:N], data[N:]

    index = HNSW(M=16, ef_construction=200, rng=random.Random(42),
                 capacity=N, l_max=5)
    # EXP_ALPHA != 1.0 builds (and caches) the alpha-occlusion-diversified
    # graph variant (clustered rows pruned to M diverse forward edges)
    alpha = float(os.environ.get("EXP_ALPHA", "1.0"))
    gpath = cache / ("graph.npz" if alpha == 1.0
                     else f"graph_a{alpha:g}.npz")
    if gpath.exists():
        with np.load(gpath) as z:  # levels: O(N) read, no neighbor decomp
            stale = z["levels"].shape[0] != N
        if stale:
            log("graph cache is for a different N; rebuilding")
            gpath.unlink()
    if gpath.exists():
        log("loading cached graph...")
        with np.load(gpath) as z:
            index._ensure_init(DIM)
            index._store.grow_to(N)
            slots = index._store.take_slots(list(range(N)))
            assert (slots == np.arange(N)).all()
            for s in range(0, N, 131072):
                e = min(N, s + 131072)
                index._store.write(np.arange(s, e), x[s:e])
            index.graph = K.Graph(
                neighbors=jnp.asarray(z["neighbors"]),
                levels=jnp.asarray(z["levels"]),
                entry=jnp.int32(int(z["entry"])),
                entry_level=jnp.int32(int(z["entry_level"])),
            )
        jax.block_until_ready(index.graph.neighbors)
    else:
        t0 = time.perf_counter()
        index.bulk_build(list(range(N)), x, alpha=alpha)
        jax.block_until_ready(index.graph.neighbors)
        log(f"build: {time.perf_counter() - t0:.0f}s")
        cache.mkdir(exist_ok=True)
        from vector_db_tpu.runtime import device_pull

        np.savez(gpath,
                 neighbors=device_pull(index.graph.neighbors),
                 levels=device_pull(index.graph.levels),
                 entry=device_pull(index.graph.entry),
                 entry_level=device_pull(index.graph.entry_level))

    gt_path = cache / "gt.npy"
    gt = np.load(gt_path) if gt_path.exists() else None
    if gt is not None and gt.shape[0] != B:
        gt = None
    if gt is None:
        from vector_db_tpu.ops.exact import exact_search_tiled

        t0 = time.perf_counter()
        from vector_db_tpu.runtime import device_pull

        gt = device_pull(exact_search_tiled(
            jnp.asarray(q), index._emb, index._has_emb, 10, tile=31250)[1])
        log(f"gt: {time.perf_counter() - t0:.0f}s")
        np.save(gt_path, gt)
    return index, x, q, gt


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax

    N = int(os.environ.get("EXP_N", 1_000_000))
    DIM, B, K10 = 768, 1000, 10
    index, x, q, gt = get_index(N, DIM, B)

    mode = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    t0 = time.perf_counter()
    index.enable_wide(dims=128, seeds=int(os.environ.get("EXP_SEEDS",
                                                         16384)),
                      inline=True)
    index.search_batch_wide(q[:8], k=K10, ef=64, frontier=16, steps=4)
    log(f"enable_wide + mirrors: {time.perf_counter() - t0:.0f}s")

    # (ef, F, T, W, seen)
    if mode == "quick":
        grid = [(256, 32, 12, 16, True)]
    elif mode == "sched":
        # frontier schedules (wide early / narrow late) vs the fixed-F
        # pareto at matched and reduced expansion budgets (sum F*T)
        sched_grid = [
            ("fixed-2240", None, 224, 10),
            ("matched-2304", ((448, 2), (224, 4), (128, 4)), 224, 10),
            ("reduced-1856", ((320, 3), (160, 4), (64, 4)), 224, 10),
            ("steep-1664", ((512, 2), (128, 5)), 224, 10),
        ]
        mk = os.environ.get("EXP_MERGE_KERNEL", "0") == "1"
        # EXP_RECALL_ONLY=1 skips the timing reps — recall-at-budget is
        # hardware-independent, so schedule shapes can be picked on the
        # CPU while the relay is down
        rec_only = os.environ.get("EXP_RECALL_ONLY", "0") == "1"
        results = []
        for name, sched, F, T in sched_grid:
            kw = dict(k=K10, ef=1280, dedup_window=16, seen_mask=False,
                      merge_kernel=mk)
            if sched is None:
                kw.update(frontier=F, steps=T)
            else:
                kw.update(schedule=sched)

            def run(v, kw=kw):
                return index.search_batch_wide(np.asarray(v), **kw)[0]

            _, ids = index.search_batch_wide(q, **kw)
            qps = None if rec_only else timed(run, q, B)
            rec = recall_of(ids, gt, K10)
            log(f"sched {name}: recall={rec:.4f} qps={qps}")
            results.append({"name": name, "schedule": sched,
                            "merge_kernel": mk, "recall": rec,
                            "qps": qps})
        out_name = "EXP_SCHED_CPU.json" if rec_only else "EXP_SCHED.json"
        Path(out_name).write_text(json.dumps(
            {"N": N, "dim": DIM, "recall_only": rec_only,
             "results": results}, indent=2))
        log(f"wrote {out_name}")
        return
    else:
        grid = [
            (1280, 224, 10, 16, False),
            (1280, 224, 9, 16, False),
            (1280, 256, 8, 16, False),
            (1280, 192, 11, 16, False),
        ]
    # EXP_MERGE_KERNEL=1 routes every row's pool merge through the
    # Pallas bitonic kernel (ops/pallas/bitonic_merge.py)
    mk = os.environ.get("EXP_MERGE_KERNEL", "0") == "1"
    results = []
    for ef, F, T, W, seen in grid:
        def run(v, ef=ef, F=F, T=T, W=W, seen=seen):
            return index.search_batch_wide(
                np.asarray(v), k=K10, ef=ef, frontier=F, steps=T,
                dedup_window=W, seen_mask=seen, merge_kernel=mk)[0]

        _, ids = index.search_batch_wide(q, k=K10, ef=ef, frontier=F,
                                         steps=T, dedup_window=W,
                                         seen_mask=seen, merge_kernel=mk)
        qps = timed(run, q, B)
        rec = recall_of(ids, gt, K10)
        log(f"wide ef={ef} F={F} T={T} W={W} seen={seen}: "
            f"recall={rec:.4f} qps={qps:.0f}")
        results.append({"ef": ef, "F": F, "T": T, "W": W, "seen": seen,
                        "merge_kernel": mk, "recall": rec, "qps": qps})

    Path("EXP_WIDE.json").write_text(json.dumps(
        {"N": N, "dim": DIM, "results": results}, indent=2))
    log("wrote EXP_WIDE.json")


if __name__ == "__main__":
    main()
