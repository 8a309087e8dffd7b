#!/usr/bin/env python
"""On-chip A/B of the IVF-PQ probe scoring formulations.

Drives _ivf_pq_probe_cells directly with synthetic cell tables at the
1M-class probe shape (k_cells x L cell-contiguous codes, m=16, ksub=256)
so the comparison isolates probe scoring + select + rerank:

  gather   — f32 per-element LUT gathers (VPU issue-bound; round-2 ref)
  onehot8  — int8 one-hot + hi/lo int8 LUT pair (round-3 default)
  pallas   — fused VMEM one-hot kernel (ops/pallas/adc_probe.py)

Writes MICRO_ADC_PROBE.json. Run on the real TPU.
"""

import json
import sys
import time
import traceback
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

    from vector_db_tpu.index.ivf import _ivf_pq_probe_cells

    log(str(jax.devices()))
    rng = np.random.default_rng(0)

    K_CELLS, L, M, KSUB, D = 2048, 512, 16, 256, 128
    N = K_CELLS * L  # ~1.05M
    N_PROBE, TOP_K, FETCH, B = 16, 10, 128, 256

    perm = rng.permutation(N).astype(np.int32)
    cell_slots = jnp.asarray(perm.reshape(K_CELLS, L))
    cell_codes = jnp.asarray(
        rng.integers(0, KSUB, (K_CELLS, L, M)).astype(np.uint8))
    cell_s = jnp.asarray(
        (rng.random((K_CELLS, L)) * 0.1).astype(np.float32))
    centroids = jnp.asarray(
        rng.standard_normal((K_CELLS, D)).astype(np.float32))
    codebooks = jnp.asarray(
        rng.standard_normal((M, KSUB, D // M)).astype(np.float32) * 0.1)
    emb = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    has_emb = jnp.ones((N,), bool)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

    out = {"shape": {"k_cells": K_CELLS, "L": L, "m": M, "ksub": KSUB,
                     "d": D, "n_probe": N_PROBE, "fetch": FETCH, "B": B}}
    ids_by_mode = {}
    for adc in ("gather", "onehot8", "pallas"):
        try:
            kw = dict(n_probe=N_PROBE, top_k=TOP_K, fetch=FETCH,
                      rerank=True, residual=True, qblock=64, adc=adc)
            t0 = time.perf_counter()
            d, i = _ivf_pq_probe_cells(
                centroids, cell_slots, cell_codes, cell_s, codebooks,
                emb, has_emb, q, q, **kw)
            jax.block_until_ready(i)
            compile_s = time.perf_counter() - t0
            ts = []
            for r in range(3):
                qv = q * (1.0 + (r + 1) * 1e-6)
                jax.block_until_ready(qv)
                t0 = time.perf_counter()
                dv, iv = _ivf_pq_probe_cells(
                    centroids, cell_slots, cell_codes, cell_s, codebooks,
                    emb, has_emb, qv, qv, **kw)
                # host-visible scalar forces FULL execution: on the relay
                # backend block_until_ready alone returned 0.1 ms for the
                # gather mode — less than its own exact rerank's gather
                # cost, i.e. before the work actually finished
                float(jnp.sum(dv.astype(jnp.float32)) +
                      jnp.sum(iv.astype(jnp.float32)))
                ts.append(time.perf_counter() - t0)
            ids_by_mode[adc] = np.asarray(i)
            out[adc] = {"compile_s": round(compile_s, 1),
                        "rep_s": [round(t, 4) for t in ts],
                        "qps": round(B / float(np.median(ts)))}
            log(f"{adc}: qps={out[adc]['qps']} reps={out[adc]['rep_s']}")
        except Exception:
            out[adc] = {"error": traceback.format_exc()[-3000:]}
            log(f"{adc} FAILED")

    if "gather" in ids_by_mode:
        ref = ids_by_mode["gather"]
        for adc, got in ids_by_mode.items():
            if adc == "gather":
                continue
            overlap = float(np.mean([
                len(set(got[r].tolist()) & set(ref[r].tolist())) / TOP_K
                for r in range(B)]))
            out[adc]["id_overlap_vs_gather"] = round(overlap, 4)
            log(f"{adc} overlap vs gather: {overlap:.4f}")

    Path("MICRO_ADC_PROBE.json").write_text(json.dumps(out, indent=1))
    log("wrote MICRO_ADC_PROBE.json")


if __name__ == "__main__":
    main()
