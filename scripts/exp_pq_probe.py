#!/usr/bin/env python
"""IVF-PQ probe phase attribution (VERDICT r2 item 6: 766 -> >=1k QPS).

MICRO_ADC_PROBE puts the fused Pallas block scoring at 4.4k QPS
standalone, yet the full probe path lands at 766 — so ~0.9 ms/query
lives OUTSIDE the ADC contraction. This isolates where:

- coarse: cd matmul + top_k(n_probe) alone
- lut: OPQ rotate + ADC LUT build alone
- full path at fetch = {top_k, 64, 128, 256}  (slope = exact-rerank cost)
- full path at qblock = {32, 64, 128}          (chunking overhead)
- adc = pallas vs gather at the winning config

Same build recipe as bench_sift (sift_like 1M x 128, k=4096, spill=1 for
the PQ index, residual m=16). Writes EXP_PQ_PROBE.json.
"""

import json
import os
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
    from vector_db_tpu.index.ivf import IvfIndex, _ivf_pq_probe_cells

    N = int(os.environ.get("BENCH_N", 1_000_000))
    B, K = 1000, 10
    x, q = sift_like(N, dim=128, seed=0, queries=B)

    t0 = time.perf_counter()
    k_cells = min(4096, max(64, N // 256))
    ivf = IvfIndex(k=k_cells)
    ivf.build_arrays(range(N), x, seed=0, iters=20, spill=1,
                     list_cap_alpha=2.0)
    log(f"build: {time.perf_counter() - t0:.0f}s")
    t0 = time.perf_counter()
    ivf.enable_pq(chunks=16, ksub=256, opq_iters=4, residual=True)
    log(f"enable_pq: {time.perf_counter() - t0:.0f}s")

    # force device tables current, grab the internals the probe uses
    _ = ivf.search_batch(q[:8], n_probe=4, top_k=K, pq=True)
    cell_slots, cell_codes, cell_s = ivf._device_cells()
    L = int(cell_slots.shape[1])
    fill = float((np.asarray(cell_slots) >= 0).mean())
    log(f"L={L} fill={fill:.2f} p_tot(n_probe=16)={16 * L}")

    out = {"N": N, "L": L, "fill": fill, "rows": []}
    qd = jnp.asarray(q)

    def timed(fn, label, reps=3):
        jax.block_until_ready(fn(qd))
        jax.block_until_ready(fn(qd * (1 + 1e-7)))
        t0 = time.perf_counter()
        for r in range(reps):
            jax.block_until_ready(fn(qd * (1 + 1e-6 * (r + 1))))
        dt = (time.perf_counter() - t0) / reps
        qps = B / dt
        log(f"{label}: {dt * 1e3:.1f} ms -> {qps:.0f} qps")
        out["rows"].append({"label": label, "ms": dt * 1e3, "qps": qps})
        Path("EXP_PQ_PROBE.json").write_text(json.dumps(out, indent=1))
        return dt

    from vector_db_tpu.index.pq import _adc_lut
    from vector_db_tpu.ops.distance import l2_sq_pairwise

    cents = ivf._centroids_dev

    @jax.jit
    def coarse(qq):
        cd = l2_sq_pairwise(qq, cents,
                            precision=jax.lax.Precision.HIGHEST)
        return jax.lax.top_k(-cd, 16)

    timed(coarse, "coarse_topk16")

    pq = ivf._pq

    rot = pq.rotation

    @jax.jit
    def lut_only(qq):
        qr = (jnp.dot(qq, rot, preferred_element_type=jnp.float32)
              if rot is not None else qq)
        return _adc_lut(qr, pq.codebooks)

    timed(lut_only, "rotate+lut")

    for n_probe in (8, 16):
        for fetch in (K, 64, 128, 256):
            timed(
                lambda v, n=n_probe, f=fetch: ivf.search_batch(
                    np.asarray(v), n_probe=n, top_k=K, pq=True,
                    fetch=f, adc="pallas")[0],
                f"full_np{n_probe}_fetch{fetch}",
            )

    # qblock sweep via the kernel entry (search_batch hardcodes the
    # 256MB-bound heuristic)
    residual = getattr(ivf, "_pq_residual", False)
    for qblock in (32, 64, 128):
        timed(
            lambda v, qb=qblock: _ivf_pq_probe_cells(
                cents, cell_slots, cell_codes, cell_s, pq.codebooks,
                ivf._emb, ivf._has_emb, v,
                jnp.dot(v, rot, preferred_element_type=jnp.float32)
                if rot is not None else v,
                n_probe=16, top_k=K, fetch=128, rerank=True,
                residual=residual, qblock=qb, adc="pallas")[0],
            f"kernel_np16_fetch128_qb{qblock}",
        )

    timed(
        lambda v: ivf.search_batch(
            np.asarray(v), n_probe=16, top_k=K, pq=True,
            fetch=128, adc="gather")[0],
        "full_np16_fetch128_gather",
    )
    log("wrote EXP_PQ_PROBE.json")


if __name__ == "__main__":
    main()
