#!/usr/bin/env python
"""BASELINE config 5 stand-in: sharded corpus scale-out on the 8-virtual-
device CPU mesh (multi-chip TPU hardware is not reachable from this
environment; the SPMD programs are identical — shard_map + XLA collectives
— so this measures correctness and merge/collective overhead structure,
NOT absolute TPU throughput).

- ShardedFlatIndex at 4M x 64-d over 8 shards: exact sharded search must
  match single-table brute force; reports merge overhead (all-gather +
  global top-k vs per-shard local work).
- ShardedHNSW at 256k x 64-d: SPMD bulk_build + streaming insert + search
  recall vs exact + SPMD delete-with-unlink.

Writes BENCH_SHARDED.json.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from vector_db_tpu.parallel.mesh import make_mesh
    from vector_db_tpu.parallel.sharded import ShardedFlatIndex, ShardedHNSW

    assert len(jax.devices()) == 8, jax.devices()
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    results = {"mesh_devices": 8, "platform": "cpu (virtual 8-device mesh)"}

    # ---- 4M exact sharded ----
    n, dim, b, k = 4_000_000, 64, 64, 10
    log(f"flat: generating {n}x{dim}...")
    x = rng.standard_normal((n, dim)).astype(np.float32)
    q = rng.standard_normal((b, dim)).astype(np.float32)
    flat = ShardedFlatIndex(mesh=mesh, dim=dim,
                            capacity_per_shard=n // 8)
    t0 = time.perf_counter()
    # one bulk write per shard-batch; route in big chunks
    step = 500_000
    for s in range(0, n, step):
        flat.insert(range(s, min(n, s + step)), x[s : s + step])
    ingest_s = time.perf_counter() - t0
    log(f"flat ingest: {ingest_s:.0f}s ({n/ingest_s:.0f} vec/s)")

    _ = flat.search_batch(q, k=k)  # warm/compile
    t0 = time.perf_counter()
    d1, ids1 = flat.search_batch(q * (1 + 1e-6), k=k)
    search_s = time.perf_counter() - t0
    log(f"flat sharded search: {b/search_s:.1f} qps (CPU mesh)")

    # ground truth on one shard-sized scan at a time (numpy)
    log("flat: brute-force ground truth...")
    gt = np.empty((b, k), np.int64)
    best_d = np.full((b, k), np.inf)
    best_i = np.full((b, k), -1, np.int64)
    for s in range(0, n, step):
        blk = x[s : s + step]
        d = (q * q).sum(1)[:, None] - 2 * q @ blk.T + (blk * blk).sum(1)[None, :]
        part = np.argpartition(d, k, axis=1)[:, :k]
        pd = np.take_along_axis(d, part, axis=1)
        cd = np.concatenate([best_d, pd], axis=1)
        ci = np.concatenate([best_i, part + s], axis=1)
        sel = np.argsort(cd, axis=1)[:, :k]
        best_d = np.take_along_axis(cd, sel, axis=1)
        best_i = np.take_along_axis(ci, sel, axis=1)
    gt = best_i
    exact_match = float(np.mean([
        len(set(ids1[i].tolist()) & set(gt[i].tolist())) / k
        for i in range(b)
    ]))
    log(f"flat sharded vs brute force: recall@{k} = {exact_match:.4f}")
    results["flat_4m"] = {
        "n": n, "dim": dim, "ingest_vps": n / ingest_s,
        "search_qps_cpu": b / search_s, "recall_vs_bruteforce": exact_match,
    }
    del x, flat

    # ---- 256k sharded HNSW: bulk build + insert + delete ----
    n2, dim2 = 262_144, 64
    log(f"hnsw: generating {n2}x{dim2}...")
    x2 = rng.standard_normal((n2, dim2)).astype(np.float32)
    q2 = rng.standard_normal((32, dim2)).astype(np.float32)
    idx = ShardedHNSW(M=12, ef_construction=80, mesh=mesh, dim=dim2,
                      capacity_per_shard=n2 // 8 + 1024)
    t0 = time.perf_counter()
    idx.bulk_build(range(n2), x2)
    build_s = time.perf_counter() - t0
    log(f"hnsw SPMD bulk_build: {build_s:.0f}s ({n2/build_s:.0f} vec/s, CPU)")

    # exact gt
    d = (q2 * q2).sum(1)[:, None] - 2 * q2 @ x2.T + (x2 * x2).sum(1)[None, :]
    gt2 = np.argsort(d, axis=1)[:, :10]
    _, ids2 = idx.search_batch(q2, k=10, ef=120)
    rec = float(np.mean([
        len(set(ids2[i].tolist()) & set(gt2[i].tolist())) / 10
        for i in range(32)
    ]))
    t0 = time.perf_counter()
    idx.search_batch(q2 * (1 + 1e-6), k=10, ef=120)
    qps = 32 / (time.perf_counter() - t0)
    log(f"hnsw sharded search: recall@10={rec:.3f} {qps:.1f} qps (CPU mesh)")

    # streaming insert into the bulk-built graphs
    extra = rng.standard_normal((1024, dim2)).astype(np.float32)
    t0 = time.perf_counter()
    idx.insert(range(n2, n2 + 1024), extra)
    ins_s = time.perf_counter() - t0
    _, eids = idx.search_batch(extra[:4], k=1, ef=80)
    assert list(eids[:, 0]) == [n2, n2 + 1, n2 + 2, n2 + 3]

    # SPMD delete with unlink
    victims = list(range(0, 4096, 16))
    t0 = time.perf_counter()
    idx.delete_batch(victims)
    del_s = time.perf_counter() - t0
    _, ids3 = idx.search_batch(x2[victims[:8]], k=5, ef=80)
    assert not (set(victims) & set(ids3.ravel().tolist()))
    log(f"hnsw insert 1024: {ins_s:.1f}s; delete {len(victims)}: {del_s:.1f}s")

    # filtered sharded search: 25% random filter set, subset contract +
    # recall vs masked brute force (filter semantics ride the SPMD path)
    fset = set(int(i) for i in
               rng.choice(n2, size=n2 // 4, replace=False))
    fset -= set(victims)
    _, fids = idx.search_batch(q2, k=10, ef=160, filter_ids=fset)
    alf = np.asarray(sorted(fset))
    df = ((q2[:, None] - x2[alf][None]) ** 2).sum(-1)
    gtf = alf[np.argsort(df, axis=1)[:, :10]]
    assert all(int(v) in fset for row in fids for v in row if v >= 0)
    rec_f = float(np.mean([
        len(set(fids[i].tolist()) & set(gtf[i].tolist())) / 10
        for i in range(32)
    ]))
    log(f"hnsw sharded filtered search (25%): recall@10={rec_f:.3f}")

    results["hnsw_256k"] = {
        "n": n2, "dim": dim2, "bulk_build_s": build_s,
        "build_vps_cpu": n2 / build_s, "recall_at_10_ef120": rec,
        "search_qps_cpu": qps, "insert_1024_s": ins_s,
        "delete_256_s": del_s, "filtered_recall_at_10_ef160": rec_f,
        "filtered_selectivity": 0.25,
    }

    Path("BENCH_SHARDED.json").write_text(json.dumps(results, indent=2))
    log(json.dumps(results))


if __name__ == "__main__":
    main()
