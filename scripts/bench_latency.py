#!/usr/bin/env python
"""Small-batch (latency-regime) serving benchmark at 1M vectors.

The batch-throughput story (BENCH_1M/BENCH_SIFT) favors streaming scans
because a batch amortizes every HBM byte. Online serving issues SMALL
batches, where per-query work decides latency: this benchmark measures
exact scan, bf16 scan, IVF-RP probe and HNSW beam at B in {1, 8, 64} on
the SIFT-shaped 1M corpus (the partitionable case where probe modes have
a real ceiling), reporting per-batch latency and QPS. Writes
BENCH_LATENCY.json.

Note: per-call dispatch through the remote TPU relay adds a fixed
overhead to every row equally; relative ordering is the signal.
"""

import json
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

    from vector_db_tpu.datasets import sift_like
    from vector_db_tpu.index.ivf import IvfIndex
    from vector_db_tpu.ops.exact import approx_search_tiled, exact_search_tiled

    N, K = 1_000_000, 10
    x, q_all = sift_like(N, dim=128, seed=0, queries=256)
    log("data ready")

    ivf = IvfIndex(k=4096)
    ivf.build_arrays(range(N), x, seed=0, iters=20, spill=2,
                     list_cap_alpha=2.0)
    ivf.enable_rp(dims=128)
    log("ivf ready")

    emb16 = ivf._emb.astype(jnp.bfloat16)
    x_sq = jax.jit(lambda e: jnp.sum(e * e, -1))(ivf._emb)
    jax.block_until_ready((emb16, x_sq))

    modes = {
        "exact_f32": lambda v: exact_search_tiled(
            jnp.asarray(v), ivf._emb, ivf._has_emb, K, tile=31250)[0],
        "bf16_scan": lambda v: approx_search_tiled(
            jnp.asarray(v), emb16, ivf._has_emb, K, tile=131072,
            x_sq=x_sq)[0],
        "ivf_rp_probe8": lambda v: ivf.search_batch(
            v, n_probe=8, top_k=K, rp=True, fetch=128)[0],
    }

    results = {"N": N, "dim": 128, "k": K,
               "data": "sift_like (see bench_sift.py)", "rows": []}
    for b in (1, 8, 64):
        q = q_all[:b]
        for name, run in modes.items():
            jax.block_until_ready(run(q * (1.0 + 1e-7)))  # warm/compile
            times = []
            for r in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(run(q * (1.0 + (r + 1) * 1e-6)))
                times.append(time.perf_counter() - t0)
            ms = float(np.median(times)) * 1000
            qps = b / (ms / 1000)
            log(f"B={b} {name}: {ms:.1f} ms/batch -> {qps:.0f} qps")
            results["rows"].append(
                {"batch": b, "mode": name, "ms_per_batch": ms, "qps": qps})

    Path("BENCH_LATENCY.json").write_text(json.dumps(results, indent=2))
    log(json.dumps(results))

    graph_1m(results)


def graph_1m(results):
    """Flagship 1M x 768 latency rows (VERDICT r3 item 3): the wide-beam
    graph engine vs the scan modes at B in {1, 8, 64}, plus the relay
    dispatch floor so device time is attributable (every row pays the
    same fixed per-call round trip; on local hardware subtract it)."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from exp_wide_1m import get_index

    from vector_db_tpu.ops.exact import approx_search_tiled

    N, DIM, B, K = 1_000_000, 768, 1000, 10
    index, x, q_all, gt = get_index(N, DIM, B)
    index.enable_wide(dims=128, seeds=4096)
    emb16 = index._emb.astype(jnp.bfloat16)
    x_sq = jax.jit(lambda e: jnp.sum(e * e, -1))(index._emb)
    jax.block_until_ready((emb16, x_sq))

    def recall_of(ids):
        return float(np.mean(
            [len(set(ids[i][:K].tolist()) & set(gt[i].tolist())) / K
             for i in range(len(gt))]))

    # relay floor: a trivial dispatch+fetch (same fixed cost every row
    # below pays; device compute is total minus this)
    tiny = jnp.zeros((8, 8), jnp.float32)
    fl = jax.jit(lambda t: jnp.sum(t * t))
    float(fl(tiny))
    floors = []
    for r in range(5):
        t0 = time.perf_counter()
        float(fl(tiny * (1.0 + r * 1e-6)))
        floors.append(time.perf_counter() - t0)
    floor_ms = float(np.median(floors)) * 1e3
    log(f"relay dispatch floor: {floor_ms:.1f} ms")

    modes = {
        "wide_ef512_ee": lambda v: index.search_batch_wide(
            v, K, ef=512, frontier=64, steps=12, early_exit=True)[0],
        "wide_ef512": lambda v: index.search_batch_wide(
            v, K, ef=512, frontier=64, steps=12)[0],
        "wide_ef256_ee": lambda v: index.search_batch_wide(
            v, K, ef=256, frontier=32, steps=12, early_exit=True)[0],
        "bf16_scan": lambda v: approx_search_tiled(
            jnp.asarray(v), emb16, index._has_emb, K, tile=125000,
            x_sq=x_sq)[0],
    }

    rows = []
    # recall once per mode at the full query set (selection logic is
    # per-query; batch size only pads)
    rec = {}
    for name, run in modes.items():
        if name == "bf16_scan":
            _, ids = approx_search_tiled(jnp.asarray(q_all), emb16,
                                         index._has_emb, K, tile=125000,
                                         x_sq=x_sq)
            ids = np.asarray(ids)
        elif "ee" in name or "wide" in name:
            ef = 512 if "512" in name else 256
            fr = 64 if "512" in name else 32
            _, ids = index.search_batch_wide(
                q_all, K, ef=ef, frontier=fr, steps=12,
                early_exit="_ee" in name)
        rec[name] = recall_of(np.asarray(ids))
        log(f"{name}: recall@10 = {rec[name]:.4f}")

    for b in (1, 8, 64):
        q = q_all[:b]
        for name, run in modes.items():
            jax.block_until_ready(np.asarray(run(q * (1.0 + 1e-7))))
            times = []
            for r in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(
                    np.asarray(run(q * (1.0 + (r + 1) * 1e-6))))
                times.append(time.perf_counter() - t0)
            ms = float(np.median(times)) * 1000
            row = {"batch": b, "mode": name, "ms_per_batch": round(ms, 2),
                   "qps": round(b / (ms / 1000)),
                   "recall": round(rec[name], 4),
                   "device_ms_est": round(max(0.0, ms - floor_ms), 2)}
            log(f"1M768 B={b} {name}: {ms:.1f} ms ({row['device_ms_est']}"
                f" ms device) recall {rec[name]:.3f}")
            rows.append(row)
            results["graph_1m_768"] = {
                "relay_floor_ms": round(floor_ms, 2), "rows": rows}
            Path("BENCH_LATENCY.json").write_text(
                json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
