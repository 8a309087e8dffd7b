#!/usr/bin/env python
"""Combined-winner wide-beam measurement at 1M x 768 (post-queue).

The sweeps measure one lever at a time (EXP_SCHED schedules, EXP_WIDE
merge kernel, EXP_ALPHA graph). This script measures the COMBINATIONS
against the flagship target (graph mode >=0.95 recall@10 at >=1000 QPS)
plus the filtered-wide recall fix, and writes EXP_WIDE_FINAL.json.

Env: EXP_ALPHA=1.2 to run on the alpha graph (cache must exist from the
long-phase exp_alpha step; falls back to the alpha=1.0 graph otherwise).
Run on the real TPU after run_measurements.sh finishes.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from exp_wide_1m import cache_for, get_index, recall_of, timed

    N, DIM, B, K10 = 1_000_000, 768, 1000, 10
    alpha = float(os.environ.get("EXP_ALPHA", "1.2"))
    if alpha != 1.0 and not (cache_for(N) / f"graph_a{alpha:g}.npz").exists():
        log(f"alpha={alpha} graph cache missing; using alpha=1.0")
        os.environ["EXP_ALPHA"] = "1.0"
        alpha = 1.0
    else:
        os.environ["EXP_ALPHA"] = str(alpha)
    index, x, q, gt = get_index(N, DIM, B)
    t0 = time.perf_counter()
    index.enable_wide(dims=128, seeds=16384, inline=True)
    index.search_batch_wide(q[:8], k=K10, ef=64, frontier=16, steps=4)
    log(f"enable_wide: {time.perf_counter() - t0:.0f}s")

    # (label, kwargs) — schedules from EXP_SCHED's grid, merge kernel,
    # seen-mask, at the efs bracketing the 0.95 frontier
    CONFIGS = [
        ("base_1280_224", dict(ef=1280, frontier=224, steps=10)),
        ("mk_1280_224", dict(ef=1280, frontier=224, steps=10,
                             merge_kernel=True)),
        # schedules gather [B, F*M, dims] at their widest step: F >= 320
        # overflows HBM on a 1k batch (exp_sched OOM) — qchunk bounds it
        ("sched_red_1280", dict(ef=1280, qchunk=500,
                                schedule=((320, 3), (160, 4), (64, 4)))),
        ("sched_red_mk_1280", dict(ef=1280, qchunk=500,
                                   schedule=((320, 3), (160, 4), (64, 4)),
                                   merge_kernel=True)),
        ("sched_match_mk_1280", dict(
            ef=1280, qchunk=500, schedule=((448, 2), (224, 4), (128, 4)),
            merge_kernel=True)),
        ("sched_red_1024", dict(ef=1024, qchunk=500,
                                schedule=((320, 3), (160, 4), (64, 4)))),
        ("sched_red_mk_1024", dict(ef=1024, qchunk=500,
                                   schedule=((320, 3), (160, 4), (64, 4)),
                                   merge_kernel=True)),
    ]
    out = {"N": N, "alpha": alpha, "rows": []}
    for label, kw in CONFIGS:
        kw = dict(k=K10, dedup_window=16, seen_mask=False, **kw)

        def run(v, kw=kw):
            return index.search_batch_wide(np.asarray(v), **kw)[0]

        try:
            t0 = time.perf_counter()
            _, ids = index.search_batch_wide(q, **kw)
            compile_s = time.perf_counter() - t0
            qps = timed(run, q, B)
            rec = recall_of(ids, gt, K10)
            row = {"label": label, **{k: str(v) for k, v in kw.items()},
                   "recall": round(rec, 4), "qps": round(qps),
                   "compile_s": round(compile_s, 1)}
        except Exception as e:
            row = {"label": label, "error": repr(e)[:500]}
        out["rows"].append(row)
        log(json.dumps(row))
        Path("EXP_WIDE_FINAL.json").write_text(json.dumps(out, indent=1))

    # filtered wide: recall-lift attempts (BENCH_1M filtered wide row is
    # 0.906 @ 518 vs classic 0.963 @ 39)
    rngf = np.random.default_rng(11)
    fslots = rngf.choice(N, size=N // 10, replace=False)
    filt = set(int(i) for i in fslots)
    import jax.numpy as jnp

    from vector_db_tpu.ops.exact import exact_search_tiled

    fmask = np.zeros((index._capacity,), bool)
    fmask[fslots] = True
    vmask = jnp.asarray(fmask) & index._has_emb
    qd = jnp.asarray(q)
    gt_f = np.asarray(exact_search_tiled(qd, index._emb, vmask, K10,
                                         tile=31250)[1])
    for label, kw in [
        ("filt_rerank512", dict(ef=1280, frontier=224, steps=10,
                                rerank_k=512)),
        ("filt_ef1536_r512", dict(ef=1536, frontier=224, steps=12,
                                  rerank_k=512)),
        ("filt_ef2048_r512", dict(ef=2048, frontier=256, steps=12,
                                  rerank_k=512)),
    ]:
        kw = dict(k=K10, seen_mask=False, filter_ids=filt, **kw)

        def runf(v, kw=kw):
            return index.search_batch_wide(np.asarray(v), **kw)[0]

        try:
            _, ids = index.search_batch_wide(q, **kw)
            qps = timed(runf, q, B)
            rec = recall_of(ids, gt_f, K10)
            row = {"label": label, "recall": round(rec, 4),
                   "qps": round(qps)}
        except Exception as e:
            row = {"label": label, "error": repr(e)[:500]}
        out["rows"].append(row)
        log(json.dumps(row))
        Path("EXP_WIDE_FINAL.json").write_text(json.dumps(out, indent=1))
    log("wrote EXP_WIDE_FINAL.json")


if __name__ == "__main__":
    main()
