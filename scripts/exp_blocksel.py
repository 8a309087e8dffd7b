#!/usr/bin/env python
"""Block-select scan tuning sweep at 1M x 768 (VERDICT item 3).

Sweeps the two-phase block-min scan (ops/exact.py:block_select_search)
over phase-1 table (PCA mirror dims / bf16 full / f32 hi-lo 3-pass /
f32 HIGHEST), blocks_k, block size, and selection mode, against the
cached flagship corpus + exact gt (/tmp/wide1m_cache). Target: a
measured recall-1.0 row at >=15k QPS. Writes EXP_BLOCKSEL.json.

Run on the real TPU, never concurrently with run_measurements.sh.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CACHE = Path("/tmp/wide1m_cache")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vector_db_tpu.ops.exact import (
        block_select_search,
        block_select_search_3p,
        exact_search_tiled,
    )

    N, DIM, B, K = 1_000_000, 768, 1000, 10
    log(str(jax.devices()))

    data = np.load(CACHE / "data.npy", mmap_mode="r")
    assert data.shape[0] >= N + B, data.shape
    x, q = np.asarray(data[:N]), np.asarray(data[N:N + B])
    emb = jnp.asarray(x)
    valid = jnp.ones((N,), bool)
    qd = jnp.asarray(q)
    x_sq = jax.jit(lambda e: jnp.sum(e * e, -1))(emb)
    jax.block_until_ready(x_sq)

    gt_path = CACHE / "gt.npy"
    if gt_path.exists():
        gt = np.load(gt_path)[:B]
    else:
        t0 = time.perf_counter()
        gt = np.asarray(exact_search_tiled(qd, emb, valid, K, tile=31250)[1])
        np.save(gt_path, gt)
        log(f"gt: {time.perf_counter() - t0:.0f}s")

    # PCA projections from the device-side covariance (hnsw._pca_proj's
    # recipe: only [dim, dim] crosses the relay)
    cov = np.asarray(
        jax.jit(lambda e: jnp.dot(e.T, e, preferred_element_type=jnp.float32))(emb)
    ) / N
    _, v = np.linalg.eigh(cov.astype(np.float64))
    v = v[:, ::-1].astype(np.float32)

    tabs = {}

    def get_tab(kind):
        if kind in tabs:
            return tabs[kind]
        if kind == "f32":
            t = (emb, qd, x_sq)
        elif kind == "bf16":
            t = (emb.astype(jnp.bfloat16), qd, x_sq)
        elif kind.startswith("proj"):
            dims = int(kind[4:])
            proj = jnp.asarray(v[:, :dims])
            tab = jnp.dot(emb, proj,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)
            qp = jnp.dot(qd, proj, preferred_element_type=jnp.float32)
            t = (tab, qp, x_sq)
        else:
            raise ValueError(kind)
        jax.block_until_ready(t[0])
        tabs[kind] = t
        return t

    def recall_of(ids):
        return float(np.mean(
            [len(set(ids[i][:K].tolist()) & set(gt[i].tolist())) / K
             for i in range(B)]))

    # (label, table kind, kwargs)
    CONFIGS = [
        # current bench rows, re-measured here as anchors
        ("exact_highest_bk10", "f32",
         dict(exact_phase1=True, blocks_k=K)),
        ("bf16_bk20", "bf16", dict(blocks_k=2 * K)),
        ("proj128_bk20", "proj128", dict(blocks_k=2 * K)),
        # hi/lo 3-pass near-exact phase 1
        ("hilo_bk20", "f32", dict(hilo_phase1=True, blocks_k=2 * K)),
        ("hilo_bk40", "f32", dict(hilo_phase1=True, blocks_k=4 * K)),
        # projected mirrors: dims and blocks_k ladder
        ("proj64_bk20", "proj64", dict(blocks_k=2 * K)),
        ("proj64_bk40", "proj64", dict(blocks_k=4 * K)),
        ("proj128_bk10", "proj128", dict(blocks_k=K)),
        ("proj128_bk40", "proj128", dict(blocks_k=4 * K)),
        ("proj128_bk80", "proj128", dict(blocks_k=8 * K)),
        # coarser blocks: half the phase-1 minima, double the phase-2 rows
        ("proj128_bk20_blk256", "proj128",
         dict(blocks_k=2 * K, block=256)),
        ("proj128_bk40_blk256", "proj128",
         dict(blocks_k=4 * K, block=256)),
        # hardware partial-reduce block selection (voids the guarantee)
        ("proj128_bk40_approx", "proj128",
         dict(blocks_k=4 * K, approx_blocks=True)),
        # bigger tiles: fewer scan iterations
        ("proj128_bk20_t262", "proj128",
         dict(blocks_k=2 * K, tile=262144)),
        # three-phase: mirror row-rescore between block select and the
        # exact cut — phase-2 traffic drops dim*4/(ds*2)x (ops/exact.py
        # block_select_search_3p)
        ("3p_proj128_bk20_r80", "proj128",
         dict(blocks_k=2 * K, rows_k=8 * K, three_phase=True)),
        ("3p_proj128_bk40_r80", "proj128",
         dict(blocks_k=4 * K, rows_k=8 * K, three_phase=True)),
        ("3p_proj128_bk40_r160", "proj128",
         dict(blocks_k=4 * K, rows_k=16 * K, three_phase=True)),
        ("3p_proj128_bk80_r160", "proj128",
         dict(blocks_k=8 * K, rows_k=16 * K, three_phase=True)),
        ("3p_proj64_bk40_r160", "proj64",
         dict(blocks_k=4 * K, rows_k=16 * K, three_phase=True)),
        ("3p_proj128_bk40_r80_approx", "proj128",
         dict(blocks_k=4 * K, rows_k=8 * K, three_phase=True,
              approx_blocks=True)),
        # fused Pallas phase 1 (ops/pallas/block_min.py): the [B, tile]
        # panel never reaches HBM — the measured phase-1 bound
        ("3pp_proj128_bk20_r80", "proj128",
         dict(blocks_k=2 * K, rows_k=8 * K, three_phase=True,
              pallas_phase1=True)),
        ("3pp_proj128_bk40_r80", "proj128",
         dict(blocks_k=4 * K, rows_k=8 * K, three_phase=True,
              pallas_phase1=True)),
        ("3pp_proj64_bk20_r80", "proj64",
         dict(blocks_k=2 * K, rows_k=8 * K, three_phase=True,
              pallas_phase1=True)),
        ("3pp_proj128_bk40_r160", "proj128",
         dict(blocks_k=4 * K, rows_k=16 * K, three_phase=True,
              pallas_phase1=True)),
        ("3pp_bf16_bk20_r80", "bf16",
         dict(blocks_k=2 * K, rows_k=8 * K, three_phase=True,
              pallas_phase1=True)),
    ]

    out = {"N": N, "dim": DIM, "B": B, "k": K, "rows": []}
    for label, kind, kw in CONFIGS:
        tab, sq, xs = get_tab(kind)
        kw = dict(kw)
        fn = (block_select_search_3p if kw.pop("three_phase", False)
              else block_select_search)
        try:
            def run(vq, sqv, fn=fn, tab=tab, xs=xs, kw=kw):
                return fn(vq, tab, sqv, xs, emb, valid, K, **kw)

            t0 = time.perf_counter()
            d0, ids = run(qd, sq)
            jax.block_until_ready(ids)
            compile_s = time.perf_counter() - t0
            rec = recall_of(np.asarray(ids))
            for w in range(2):
                jax.block_until_ready(
                    run(qd * (1 + 1e-7 * (w + 1)),
                        sq * (1 + 1e-7 * (w + 1)))[1])
            ts = []
            for r in range(3):
                e = 1 + 1e-6 * (r + 1)
                t0 = time.perf_counter()
                jax.block_until_ready(run(qd * e, sq * e)[1])
                ts.append(time.perf_counter() - t0)
            qps = B / float(np.median(ts))
            row = {"label": label, "tab": kind, **kw,
                   "recall": round(rec, 4), "qps": round(qps),
                   "compile_s": round(compile_s, 1),
                   "rep_s": [round(t, 4) for t in ts]}
        except Exception as e:  # OOM / compile failure: record and move on
            row = {"label": label, "tab": kind, **kw,
                   "error": repr(e)[:500]}
        out["rows"].append(row)
        log(json.dumps(row))
        Path("EXP_BLOCKSEL.json").write_text(json.dumps(out, indent=1))

    # phase-1-only timing (block mins + exact block top_k, no rescore):
    # attributes the two/three-phase rows' cost between the streaming
    # scan and the rescore pipeline
    from functools import partial

    @partial(jax.jit, static_argnames=("tile", "block", "bk"))
    def p1_only(sq, tab, xs, tile, block, bk):
        pad = (-tab.shape[0]) % tile
        if pad:
            tab = jnp.concatenate(
                [tab, jnp.zeros((pad, tab.shape[1]), tab.dtype)])
            xs = jnp.concatenate([xs, jnp.full((pad,), 2.0e38, xs.dtype)])
        n_tiles = tab.shape[0] // tile
        st_t = tab.reshape(n_tiles, tile, tab.shape[1])
        xsq_t = xs.reshape(n_tiles, tile)
        b = sq.shape[0]

        def p1(_, t):
            t_tab, t_xsq = t
            cross = jnp.dot(sq.astype(tab.dtype), t_tab.T,
                            preferred_element_type=jnp.float32)
            d = t_xsq[None, :] - 2.0 * cross
            return None, jnp.min(
                d.reshape(b, tile // block, block), axis=-1)

        _, mins = jax.lax.scan(p1, None, (st_t, xsq_t))
        mins = jnp.moveaxis(mins, 0, 1).reshape(b, -1)
        return jax.lax.top_k(-mins, bk)[1]

    for kind in ("proj128", "bf16"):
        tab, sq, xs = get_tab(kind)
        try:
            jax.block_until_ready(
                p1_only(sq, tab, xs, 131072, 128, 40))
            ts = []
            for r in range(3):
                e = 1 + 1e-6 * (r + 1)
                t0 = time.perf_counter()
                jax.block_until_ready(
                    p1_only(sq * e, tab, xs, 131072, 128, 40))
                ts.append(time.perf_counter() - t0)
            row = {"label": f"p1only_{kind}_bk40", "tab": kind,
                   "qps": round(B / float(np.median(ts))),
                   "rep_s": [round(t, 4) for t in ts]}
        except Exception as e:
            row = {"label": f"p1only_{kind}_bk40", "error": repr(e)[:500]}
        out["rows"].append(row)
        log(json.dumps(row))

    # fused-kernel phase-1-only timer (block_min_scan + exact block top_k)
    from vector_db_tpu.ops.pallas.block_min import block_min_scan

    @partial(jax.jit, static_argnames=("bk",))
    def p1p_only(sq2, tab2, xs2, bk):
        mins = block_min_scan(sq2, tab2, xs2, block=128, tile=2048,
                              qtile=256, interpret=False)
        return jax.lax.top_k(-mins, bk)[1]

    for kind in ("proj128", "bf16"):
        tab, sq, xs = get_tab(kind)
        try:
            jax.block_until_ready(p1p_only(sq, tab, xs, 40))
            ts = []
            for r in range(3):
                e = 1 + 1e-6 * (r + 1)
                t0 = time.perf_counter()
                jax.block_until_ready(p1p_only(sq * e, tab, xs, 40))
                ts.append(time.perf_counter() - t0)
            row = {"label": f"p1pallas_{kind}_bk40", "tab": kind,
                   "qps": round(B / float(np.median(ts))),
                   "rep_s": [round(t, 4) for t in ts]}
        except Exception as e:
            row = {"label": f"p1pallas_{kind}_bk40",
                   "error": repr(e)[:500]}
        out["rows"].append(row)
        log(json.dumps(row))
    Path("EXP_BLOCKSEL.json").write_text(json.dumps(out, indent=1))
    log("wrote EXP_BLOCKSEL.json")


if __name__ == "__main__":
    main()
