#!/usr/bin/env python
"""Phase-1 Pallas envelope sweep at 1M x 768 (VERDICT r3 item 1).

Round-3 attribution (EXP_BLOCKSEL.json): the fused block-min kernel ran
its grid as 2048 tiny steps (tile=2048, qtile=256) — ~17 us of fixed
per-step overhead each, 36 ms for a ~1.3 ms roofline — and phases 2+3
added ~21 ms on top. This sweeps (tile, qtile) for the reworked kernel,
attributes the full 3-phase pipeline stage by stage, and lands the best
full-path rows. Writes EXP_P1.json.

Uses the shared /tmp/wide1m_cache corpus (graph not needed); computes and
caches gt.npy if absent.
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CACHE = Path("/tmp/wide1m_cache")
N, DIM, B, K = 1_000_000, 768, 1000, 10


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(run, q, reps=3, warm=3):
    """run(q) must return a float (fetched scalar => forced sync)."""
    sigs = []
    for w in range(warm):
        run(q * (1.0 + w * 1e-7))
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        sigs.append(run(q * (1.0 + (r + 1) * 1e-6)))
        ts.append(time.perf_counter() - t0)
    assert len(set(sigs)) == len(sigs), f"memoized reps {sigs}"
    return float(np.median(ts)), [round(t, 4) for t in ts]


def recall_of(ids, gt, k):
    return float(np.mean(
        [len(set(ids[i][:k].tolist()) & set(gt[i].tolist())) / k
         for i in range(len(gt))]))


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vector_db_tpu.ops.exact import (block_select_search_3p,
                                         exact_search_tiled)
    from vector_db_tpu.ops.pallas.block_min import block_min_scan

    data = np.load(CACHE / "data.npy", mmap_mode="r")
    assert data.shape == (N + B, DIM), data.shape
    x_np = np.asarray(data[:N])
    q_np = np.asarray(data[N:])
    x = jnp.asarray(x_np)
    q = jnp.asarray(q_np)
    valid = jnp.ones((N,), bool)
    x_sq = jnp.sum(x * x, axis=-1)

    gt_path = CACHE / "gt.npy"
    if gt_path.exists():
        gt = np.load(gt_path)
    else:
        t0 = time.perf_counter()
        gt = np.asarray(exact_search_tiled(q, x, valid, K, tile=31250)[1])
        log(f"gt: {time.perf_counter() - t0:.0f}s")
        np.save(gt_path, gt)

    # mirrors: PCA-128 bf16 (the round-3 winner) + full-dim bf16
    cov = np.asarray(jax.jit(
        lambda e: jnp.dot(e.T, e, preferred_element_type=jnp.float32))(x)
    ) / N
    _, vecs = np.linalg.eigh(cov.astype(np.float64))
    proj = jnp.asarray(vecs[:, ::-1][:, :128].astype(np.float32))
    ptab = jnp.dot(x, proj,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    btab = x.astype(jnp.bfloat16)
    xsq_eff = jnp.where(valid, x_sq, 2.0e38)
    jax.block_until_ready((ptab, btab, xsq_eff))

    # section gating: EXP_P1_SECTIONS=full skips the (re-measured)
    # sweep/stage sections and goes straight to the landable full rows,
    # merging into an existing EXP_P1.json
    import os

    SEC = set(os.environ.get("EXP_P1_SECTIONS", "all").split(","))
    prev = Path("EXP_P1.json")
    if "all" not in SEC and prev.exists():
        out = json.loads(prev.read_text())
        out.setdefault("rows", [])
    else:
        out = {"N": N, "dim": DIM, "B": B, "k": K, "p1_sweep": [],
               "stages": [], "rows": []}

    def want(s):
        return "all" in SEC or s in SEC

    def qp_of(qv):
        return jnp.dot(qv, proj, preferred_element_type=jnp.float32)

    # ---- 1. p1-only (tile, qtile) sweep on both mirrors ----
    for tab_name, tab in (("proj128", ptab), ("bf16_768", btab)) \
            if want("sweep") else ():
        for tile, qtile in ((2048, 256), (4096, 512), (8192, 512),
                            (8192, 1024), (16384, 512), (4096, 1024),
                            (2048, 1024)):
            if tab.shape[1] * tile * 2 * 2 > 9_000_000:
                continue  # skip configs far past the VMEM envelope

            def run(qv, tile=tile, qtile=qtile, tab=tab):
                sq = qp_of(qv) if tab is ptab else qv
                mins = block_min_scan(sq, tab, xsq_eff, block=128,
                                      tile=tile, qtile=qtile)
                # clamp: padded blocks carry 2e38 and the subsample can
                # hit them at large tiles -> inf sums broke the signature
                return float(jnp.sum(jnp.minimum(mins, 1.0e30)[:, ::97]))

            try:
                t0 = time.perf_counter()
                run(q)
                compile_s = round(time.perf_counter() - t0, 1)
                med, reps = timed(run, q)
                row = {"tab": tab_name, "tile": tile, "qtile": qtile,
                       "qps": round(B / med), "compile_s": compile_s,
                       "rep_s": reps}
            except Exception as e:
                row = {"tab": tab_name, "tile": tile, "qtile": qtile,
                       "error": repr(e)[:200]}
            log(f"p1 {row}")
            out["p1_sweep"].append(row)
            Path("EXP_P1.json").write_text(json.dumps(out, indent=1))

    cands = [r for r in out.get("p1_sweep", [])
             if r["tab"] == "proj128" and "qps" in r]
    if cands:
        best = max(cands, key=lambda r: r["qps"])
        T, QT = best["tile"], best["qtile"]
        log(f"best proj128 p1 config: tile={T} qtile={QT} "
            f"{best['qps']} qps")
    else:
        T, QT = 4096, 512  # the measured optimum (kernel defaults)

    # ---- 2. stage attribution with the best config ----
    BK, RK = 20, 80
    # N=1e6 is not a 128-multiple: pad the mirror to the phase-1 tile
    # multiple once so block reshapes and the kernel agree on n_blocks
    n_p = N + ((-N) % T)
    n_blocks = n_p // 128
    ptab_p = jnp.concatenate(
        [ptab, jnp.zeros((n_p - N, ptab.shape[1]), ptab.dtype)])
    xsqe_p = jnp.concatenate(
        [xsq_eff, jnp.full((n_p - N,), 2.0e38, xsq_eff.dtype)])

    # tables are ARGS, not closure captures: a jit-captured 3 GB table
    # becomes a lowering constant (measured: "3.33GB of constants",
    # 30+ min wedged compile)
    @partial(jax.jit, static_argnames=("stage",))
    def staged(qv, qp, ptab_p, xsqe_p, x, stage):
        mins = block_min_scan(qp, ptab_p, xsqe_p, block=128, tile=T,
                              qtile=QT)
        if stage == "p1":
            return jnp.sum(jnp.minimum(mins, 1.0e30)[:, ::97])
        _, bidx = jax.lax.top_k(-mins, BK)
        if stage == "sel":
            return jnp.sum(bidx)
        st_b = ptab_p.reshape(n_blocks, 128, ptab.shape[1])
        xsq_b = xsqe_p.reshape(n_blocks, 128)  # padded rows masked BIG
        sq16 = qp.astype(ptab.dtype)
        rows = st_b[bidx]
        est = (xsq_b[bidx]
               - 2.0 * jnp.einsum("qcbd,qd->qcb", rows, sq16,
                                  preferred_element_type=jnp.float32))
        est = est.reshape(B, BK * 128)
        _, rpos = jax.lax.top_k(-est, RK)
        if stage == "p2":
            return jnp.sum(rpos)
        row_ids = (bidx[:, :, None] * 128
                   + jnp.arange(128, dtype=jnp.int32)[None, None, :]
                   ).reshape(B, BK * 128)
        cand = jnp.take_along_axis(row_ids, rpos, axis=1)
        crows = x[cand]
        d = (jnp.sum(crows * crows, axis=-1)
             - 2.0 * jnp.einsum("brd,bd->br", crows, qv,
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
             + jnp.sum(qv * qv, axis=-1, keepdims=True))
        neg, pos = jax.lax.top_k(-d, K)
        return jnp.sum(-neg)

    for stage in (("p1", "sel", "p2", "p3") if want("stages") else ()):
        def run(qv, stage=stage):
            return float(staged(qv, qp_of(qv), ptab_p, xsqe_p, x, stage))

        med, reps = timed(run, q)
        row = {"stage": stage, "qps": round(B / med), "rep_s": reps}
        log(f"stage {row}")
        out["stages"].append(row)
        Path("EXP_P1.json").write_text(json.dumps(out, indent=1))

    # ---- 3. full-path rows (the landable numbers) ----
    def full_row(label, tab, bk, rk, **kw):
        def run(qv):
            sq = qp_of(qv) if tab is ptab else qv
            d, i = block_select_search_3p(
                qv, tab, sq, x_sq, x, valid, K, tile=131072,
                blocks_k=bk, rows_k=rk, pallas_phase1=True,
                p1_tile=T, p1_qtile=QT, **kw)
            return float(jnp.sum(d) + 1e-8 * jnp.sum(i))

        def run_ids(qv):
            sq = qp_of(qv) if tab is ptab else qv
            return np.asarray(block_select_search_3p(
                qv, tab, sq, x_sq, x, valid, K, tile=131072,
                blocks_k=bk, rows_k=rk, pallas_phase1=True,
                p1_tile=T, p1_qtile=QT, **kw)[1])

        try:
            t0 = time.perf_counter()
            run(q)
            compile_s = round(time.perf_counter() - t0, 1)
            med, reps = timed(run, q)
            rec = recall_of(run_ids(q), gt, K)
            row = {"label": label, "blocks_k": bk, "rows_k": rk,
                   "recall": rec, "qps": round(B / med),
                   "compile_s": compile_s, "rep_s": reps}
        except Exception as e:
            row = {"label": label, "error": repr(e)[:300]}
        log(f"full {row}")
        out["rows"].append(row)
        Path("EXP_P1.json").write_text(json.dumps(out, indent=1))

    full_row("3p_proj128_bk20_r80", ptab, 20, 80)
    full_row("3p_proj128_bk10_r40", ptab, 10, 40)
    full_row("3p_proj128_bk20_r40", ptab, 20, 40)
    full_row("3p_proj128_bk40_r80", ptab, 40, 80)
    full_row("3p_bf16_bk20_r80", btab, 20, 80)
    full_row("3p_proj128_bk20_r80_approx", ptab, 20, 80,
             approx_blocks=True)
    log("done")


if __name__ == "__main__":
    main()
