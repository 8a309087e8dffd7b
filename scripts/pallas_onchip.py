#!/usr/bin/env python
"""Retry on-chip (Mosaic) compilation of the two Pallas kernels and, when
they compile, measure them against the XLA production paths.

The remote relay's tpu_compile_helper has intermittently crashed (HTTP
500) on Mosaic compiles — this script captures the FULL error text so a
toolchain failure is distinguishable from a kernel bug, and merges the
outcome into BENCH_PALLAS.json under "on_chip_r3".

Run: python scripts/pallas_onchip.py (needs the real TPU).
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

    from vector_db_tpu.ops.pallas.adc_scan import adc_topk
    from vector_db_tpu.ops.pallas.l2_topk import l2_topk

    log(str(jax.devices()))
    out = {"l2_topk": {}, "adc_topk": {}, "bitonic_merge": {},
           "adc_probe": {}}

    # ---- small-shape compile + correctness probes ----
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((4096, 128)).astype(np.float32))
    valid = jnp.ones((4096,), bool)
    q = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))

    try:
        t0 = time.perf_counter()
        d, i = l2_topk(q, emb, valid, k=10, tile=1024)
        jax.block_until_ready(i)
        # host oracle
        dd = ((np.asarray(q)[:, None, :] - np.asarray(emb)[None, :, :]) ** 2
              ).sum(-1)
        gt = np.argsort(dd, axis=1)[:, :10]
        agree = float(np.mean([
            len(set(np.asarray(i)[r].tolist()) & set(gt[r].tolist())) / 10
            for r in range(8)]))
        out["l2_topk"]["small"] = {
            "compiled_on_chip": True,
            "compile_run_s": round(time.perf_counter() - t0, 1),
            "id_agreement_vs_host": agree,
        }
        log(f"l2_topk small OK (agreement {agree})")
    except Exception:
        out["l2_topk"]["small"] = {"compiled_on_chip": False,
                                   "error": traceback.format_exc()[-3000:]}
        log("l2_topk small FAILED")

    codes = jnp.asarray(rng.integers(0, 256, (4096, 16)).astype(np.int32))
    lut = jnp.asarray(rng.random((8, 16, 256)).astype(np.float32))
    try:
        t0 = time.perf_counter()
        d, i = adc_topk(lut, codes, valid, k=10, tile=1024)
        jax.block_until_ready(i)
        # oracle: interpret-mode kernel (tests prove it equals XLA ADC)
        d2, i2 = adc_topk(lut, codes, valid, k=10, tile=1024, interpret=True)
        same = bool(np.array_equal(np.asarray(i), np.asarray(i2)))
        out["adc_topk"]["small"] = {
            "compiled_on_chip": True,
            "compile_run_s": round(time.perf_counter() - t0, 1),
            "ids_equal_interpret": same,
        }
        log(f"adc_topk small OK (ids_equal_interpret {same})")
    except Exception:
        out["adc_topk"]["small"] = {"compiled_on_chip": False,
                                    "error": traceback.format_exc()[-3000:]}
        log("adc_topk small FAILED")

    # ---- 1M ADC head-to-head vs the XLA one-hot path (if compiled) ----
    if out["adc_topk"]["small"].get("compiled_on_chip"):
        N, M_SUB, KSUB, B = 1_000_000, 16, 256, 128
        codes_b = jnp.asarray(
            rng.integers(0, KSUB, (N, M_SUB)).astype(np.int32))
        valid_b = jnp.ones((N,), bool)
        lut_b = jnp.asarray(
            rng.random((B, M_SUB, KSUB)).astype(np.float32))
        try:
            t0 = time.perf_counter()
            d, i = adc_topk(lut_b, codes_b, valid_b, k=10, tile=1024)
            jax.block_until_ready(i)
            compile_s = time.perf_counter() - t0
            ts = []
            for r in range(3):
                lv = lut_b * (1.0 + (r + 1) * 1e-6)
                t0 = time.perf_counter()
                jax.block_until_ready(
                    adc_topk(lv, codes_b, valid_b, k=10, tile=1024))
                ts.append(time.perf_counter() - t0)
            out["adc_topk"]["head_to_head_1M_m16_B128"] = {
                "compile_s": round(compile_s, 1),
                "pallas_qps": round(B / float(np.median(ts))),
            }
            log(f"adc 1M pallas qps={B / float(np.median(ts)):.0f}")
        except Exception:
            out["adc_topk"]["head_to_head_1M_m16_B128"] = {
                "compiled_on_chip": False,
                "error": traceback.format_exc()[-3000:]}
            log("adc 1M FAILED")

        # XLA one-hot ADC comparison at the same shape
        try:
            from vector_db_tpu.index.pq import _adc_search_matmul

            dx, ix = _adc_search_matmul(lut_b, codes_b, valid_b,
                                        top_k=10, k=KSUB)
            jax.block_until_ready(ix)
            ts = []
            for r in range(3):
                lv = lut_b * (1.0 + (r + 1) * 1e-6)
                t0 = time.perf_counter()
                jax.block_until_ready(
                    _adc_search_matmul(lv, codes_b, valid_b,
                                       top_k=10, k=KSUB))
                ts.append(time.perf_counter() - t0)
            out["adc_topk"]["xla_onehot_same_shape_qps"] = round(
                B / float(np.median(ts)))
        except Exception:
            out["adc_topk"]["xla_onehot_same_shape_qps"] = None

    # ---- bitonic pool-merge kernel (wide-beam merge) ----
    try:
        from vector_db_tpu.ops.pallas.bitonic_merge import sorted_topk

        cat_d = jnp.asarray(
            rng.standard_normal((32, 4864)).astype(np.float32)
        ).astype(jnp.bfloat16)
        cat_se = jnp.asarray(
            rng.integers(0, 1 << 20, (32, 4864)).astype(np.int32))
        t0 = time.perf_counter()
        pd, ps = sorted_topk(cat_d, cat_se, 1280, block_b=32,
                             interpret=False)
        jax.block_until_ready(ps)
        pd2, ps2 = sorted_topk(cat_d, cat_se, 1280, block_b=32,
                               interpret=True)
        same = bool(np.array_equal(np.asarray(ps), np.asarray(ps2)))
        out["bitonic_merge"]["prod_shape"] = {
            "compiled_on_chip": True,
            "compile_run_s": round(time.perf_counter() - t0, 1),
            "ids_equal_interpret": same,
        }
        log(f"bitonic_merge prod shape OK (ids_equal_interpret {same})")
    except Exception:
        out["bitonic_merge"]["prod_shape"] = {
            "compiled_on_chip": False,
            "error": traceback.format_exc()[-3000:]}
        log("bitonic_merge FAILED")

    # ---- fused ADC probe kernel (IVF-PQ probe path) ----
    try:
        from vector_db_tpu.ops.pallas.adc_probe import adc_probe_scores

        bq, m_, ks, pp = 8, 16, 256, 4096
        lutp = jnp.asarray(rng.random((bq, m_, ks)).astype(np.float32))
        codesp = jnp.asarray(
            rng.integers(0, ks, (bq, m_, pp)).astype(np.int32))
        corrp = jnp.zeros((bq, pp), jnp.float32)
        validp = jnp.ones((bq, pp), bool)
        t0 = time.perf_counter()
        dp = adc_probe_scores(lutp, codesp, corrp, validp, tile=1024)
        jax.block_until_ready(dp)
        dp2 = adc_probe_scores(lutp, codesp, corrp, validp, tile=1024,
                               interpret=True)
        a, b2 = np.asarray(dp, np.float64), np.asarray(dp2, np.float64)
        close = bool(np.allclose(a, b2, rtol=2e-4, atol=2e-3))
        # host f64 oracle: which of compiled/interpret is the wrong one?
        lut_h = np.asarray(lutp, np.float64)
        codes_h = np.asarray(codesp)
        oracle = np.zeros((bq, pp))
        for j in range(m_):
            oracle += np.take_along_axis(lut_h[:, j, :], codes_h[:, j, :],
                                         axis=1)
        # decision-relevant metric: top-fetch set agreement (exact rerank
        # follows in the probe path, so only the fetched set matters)
        fetch = 128
        agree = float(np.mean([
            len(set(np.argsort(a[r])[:fetch].tolist())
                & set(np.argsort(oracle[r])[:fetch].tolist())) / fetch
            for r in range(bq)]))
        out["adc_probe"]["prod_shape"] = {
            "compiled_on_chip": True,
            "compile_run_s": round(time.perf_counter() - t0, 1),
            "close_to_interpret": close,
            "max_abs_vs_interpret": float(np.max(np.abs(a - b2))),
            "max_abs_vs_f64_compiled": float(np.max(np.abs(a - oracle))),
            "max_abs_vs_f64_interpret": float(np.max(np.abs(b2 - oracle))),
            "top128_agreement_vs_f64": round(agree, 4),
        }
        log(f"adc_probe prod shape OK (close_to_interpret {close}, "
            f"top128 {agree:.4f})")
    except Exception:
        out["adc_probe"]["prod_shape"] = {
            "compiled_on_chip": False,
            "error": traceback.format_exc()[-3000:]}
        log("adc_probe FAILED")

    # ---- fused block-min phase-1 kernel (block-select scan) ----
    try:
        from vector_db_tpu.ops.pallas.block_min import block_min_scan

        nb, dsb, bb = 131072, 128, 256
        tabb = jnp.asarray(
            rng.standard_normal((nb, dsb)).astype(np.float32)
        ).astype(jnp.bfloat16)
        qb = jnp.asarray(rng.standard_normal((bb, dsb)).astype(np.float32))
        xsqb = jnp.asarray((rng.random(nb) * 10).astype(np.float32))
        t0 = time.perf_counter()
        mb = block_min_scan(qb, tabb, xsqb, interpret=False)
        jax.block_until_ready(mb)
        mb2 = block_min_scan(qb, tabb, xsqb, interpret=True)
        closeb = bool(np.allclose(np.asarray(mb), np.asarray(mb2),
                                  rtol=1e-5, atol=1e-4))
        out["block_min"] = {"prod_shape": {
            "compiled_on_chip": True,
            "compile_run_s": round(time.perf_counter() - t0, 1),
            "close_to_interpret": closeb,
            "max_abs_vs_interpret": float(
                np.max(np.abs(np.asarray(mb) - np.asarray(mb2)))),
        }}
        log(f"block_min prod shape OK (close_to_interpret {closeb})")
    except Exception:
        out["block_min"] = {"prod_shape": {
            "compiled_on_chip": False,
            "error": traceback.format_exc()[-3000:]}}
        log("block_min FAILED")

    prev = json.loads(Path("BENCH_PALLAS.json").read_text())
    prev["on_chip_r3"] = out
    Path("BENCH_PALLAS.json").write_text(json.dumps(prev, indent=1))
    log("wrote BENCH_PALLAS.json")


if __name__ == "__main__":
    main()
