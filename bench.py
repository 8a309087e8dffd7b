#!/usr/bin/env python
"""Headline benchmark: query throughput at recall@10 >= 0.95, one chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": <QPS at recall@10>=0.95 on 1M x 768-d>,
   "unit": "qps", "vs_baseline": <ours / reference, matched corpus>}

The engine serves a recall target with whichever index mode is fastest at
that target. On TPU the fastest mode at 1M x 768 is the bf16 scan with the
hardware top-k reduction (ops/exact.py:approx_search_tiled — measured
recall@10 ~0.998 vs f32-exact ground truth); the f32-exact scan (recall
1.0) is measured alongside, as are HNSW graph-mode operating points
(BENCH_DETAILS.json).

vs_baseline is a matched head-to-head: the reference (pure-Python HNSW on
CPU — its only search path) and this engine run on the SAME corpus
(BENCH_REF_N vectors), each at its fastest mode reaching recall@10 >= 0.95
against exact ground truth; the ratio compares those operating points.

Data: synthetic "embedding-like" vectors — low intrinsic dimension
(rank-64 mixing + noise, L2-normalized), matching the structure of real
sentence-embedding corpora (the reference's default all-MiniLM-L6-v2 is
384-d L2-normalized; BASELINE.md config 1). See vector_db_tpu/datasets.py.

Timing methodology (hard-won, do not regress):
- the first 1-2 executions of a compiled program through the axon relay
  run ~4x slow — warm with >=3 calls before timing;
- the relay MEMOIZES identical (executable, inputs) pairs — every timed
  repetition must use a distinct query batch, and the harness asserts the
  reps actually produced distinct results.

Env knobs:
  BENCH_N          corpus for the HNSW detail numbers (default 100000)
  BENCH_HEADLINE_N corpus for the headline scan numbers (default 1000000)
  BENCH_REF_N      corpus size for the head-to-head (default 10000)
  BENCH_QUERIES    query batch (default 1000)
  BENCH_SKIP_REF   "1" = reuse cached reference measurement only
  BENCH_REF_CACHE  path of the reference-measurement cache JSON

All diagnostics go to stderr; details are written to BENCH_DETAILS.json.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time
from pathlib import Path

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def recall_at_k(ids: np.ndarray, gt: np.ndarray, k: int) -> float:
    return float(
        np.mean([len(set(ids[i][:k]) & set(gt[i][:k])) / k
                 for i in range(len(gt))])
    )


REP_TIMES: dict = {}  # label -> per-rep wall times (relay forensics)


def timed_qps(run, q, n_q: int, reps: int = 3, warmups: int = 3,
              label: str | None = None):
    """Time `run(query_batch) -> (result, sig)` with warm-up + varied inputs.

    ``sig`` must be a float derived from the returned DISTANCES (top-k ids
    are legitimately stable under tiny query perturbations; distances are
    not). Asserts the varied reps produced distinct signatures — a
    regression that re-identifies inputs would otherwise let the relay's
    execution memoization silently inflate the numbers.

    Per-rep times are kept in REP_TIMES[label] so BENCH_DETAILS.json can
    distinguish a degraded-relay session (high variance / uniformly slow
    reps + slow canary) from a real regression after the fact.
    """
    for w in range(warmups):
        run(q * (1.0 + w * 1e-7))
    outs = []
    sigs = []
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        o, sig = run(q * (1.0 + (r + 1) * 1e-6))
        times.append(time.perf_counter() - t0)
        outs.append(o)
        sigs.append(float(sig))
    assert len(set(sigs)) == len(sigs), (
        "timed repetitions returned identical distance signatures — inputs "
        f"were not varied; memoized timings would be bogus ({sigs})"
    )
    if label is not None:
        REP_TIMES[label] = [round(t, 5) for t in times]
    # median-of-reps: the remote TPU relay stalls transiently (measured
    # 2x swings between identical runs); the median rejects those spikes
    # without fabricating anything
    return n_q / float(np.median(times)), outs


def timed_pipelined(dispatch, q, n_q: int, depth: int = 8, reps: int = 3,
                    label: str | None = None) -> float:
    """Sustained (queue-depth ``depth``) QPS of ``dispatch(batch) ->
    device result`` (NO per-call sync).

    The axon relay charges ~20-25 ms per synchronized dispatch (round-4
    EXP_P1: one fused phase-1 program = ~25 ms/call end-to-end vs a
    ~1.5 ms device roofline), so per-call forced-sync QPS measures the
    relay, not the engine. A serving system keeps a queue of in-flight
    batches; TPU execution is in-order, so blocking on all ``depth``
    results after dispatching them back-to-back bounds the true device
    throughput the way a real request queue would. Every dispatch gets a
    distinct input (the relay memoizes (executable, inputs)); all
    ``depth`` outputs are block_until_ready'd inside the timed window.
    """
    import jax

    # sync methodology, probed 2026-08-19 (8192^3 bf16 matmul):
    # dispatch-only returns in 0.46 ms (async), block_until_ready in
    # 35.5 ms (= sync RTT + compute — it DOES wait for retirement), a
    # scalar fetch adds one more ~30 ms round trip on top. So
    # block_until_ready is an honest sync and the cheapest one.
    jax.block_until_ready(dispatch(q * (1.0 + 1e-7)))  # warm/compile
    jax.block_until_ready(dispatch(q * (1.0 + 2e-7)))
    times = []
    for r in range(reps):
        vs = [q * (1.0 + (r * depth + i + 1) * 1e-6) for i in range(depth)]
        t0 = time.perf_counter()
        outs = [dispatch(v) for v in vs]
        jax.block_until_ready(outs)
        times.append(time.perf_counter() - t0)
    if label is not None:
        REP_TIMES[label] = [round(t, 5) for t in times]
    return depth * n_q / float(np.median(times))


def relay_canary(reps: int = 5) -> dict:
    """Fixed tiny-matmul timing: a relay-health reference point.

    The same [1024, 1024] f32 matmul every session — ~2 GFLOP, far below
    device limits, so its wall time is dominated by relay dispatch. A
    healthy session measures ~the same canary; a degraded one (slow/laggy
    tunnel) shows up here and explains a slow headline without a code
    regression.
    """
    import jax
    import jax.numpy as jnp

    a = jnp.asarray(np.random.default_rng(0).normal(
        size=(1024, 1024)).astype(np.float32))
    # force-sync trap (README §1c): through the axon relay,
    # block_until_ready can return before the computation actually
    # retires (round-3 canary recorded a physically impossible
    # 17.9 PFLOP/s). Every timed call here fetches a scalar of the
    # RESULT to host — the only sync the relay honors.
    f = jax.jit(lambda a, b: (a @ b)[0, 0])
    float(f(a, a))
    times = []
    for r in range(reps):
        b = a * (1.0 + (r + 1) * 1e-6)
        float(b[0, 0])
        t0 = time.perf_counter()
        float(f(a, b))
        times.append(time.perf_counter() - t0)
    out = {"matmul_1024_ms": [round(t * 1e3, 3) for t in times],
           "median_ms": round(float(np.median(times)) * 1e3, 3)}
    # sustained-throughput canary: the tiny matmul is dispatch-bound and
    # stayed healthy (0.037 ms) in a session where every 1M-scan ran
    # 1.9x slow — chip/relay THROUGHPUT degradation needs a compute-bound
    # probe. 8k^3 bf16 = 1.1 TFLOP; report effective TFLOP/s.
    big = jnp.ones((8192, 8192), jnp.bfloat16)
    fb = jax.jit(lambda a, b: jnp.sum((a @ b)[0]))
    float(fb(big, big))
    ts = []
    for r in range(3):
        b2 = big * (1.0 + (r + 1) * 1e-3)
        float(b2[0, 0])
        t0 = time.perf_counter()
        float(fb(big, b2))
        ts.append(time.perf_counter() - t0)
    flops = 2 * 8192**3
    out["matmul_8192_bf16_tflops"] = round(
        flops / float(np.median(ts)) / 1e12, 1)
    # per-call TFLOP/s includes one sync round trip (measured ~30 ms on
    # a laggy tunnel, ~1 ms healthy), so it attributes RTT degradation.
    # Sustained TFLOP/s pipelines 4 dispatches per sync — the relay RTT
    # amortizes away and what remains is true chip/tunnel THROUGHPUT,
    # the quantity the sustained headline rows depend on.
    ts = []
    for r in range(3):
        vs = [big * (1.0 + (r * 4 + i + 2) * 1e-3) for i in range(4)]
        jax.block_until_ready(vs)
        t0 = time.perf_counter()
        outs = [fb(big, v) for v in vs]
        jax.block_until_ready(outs)
        ts.append(time.perf_counter() - t0)
    out["sustained_bf16_tflops"] = round(
        4 * flops / float(np.median(ts)) / 1e12, 1)
    # verdict: v5e bf16 peak is ~197 TFLOP/s; a healthy session sustains
    # >=100 on this shape pipelined. rtt_high is a separate axis: it
    # depresses per-call rows but NOT the pipelined/sustained ones. The
    # headline JSON line carries this so a degraded session is
    # distinguishable from a code regression in the record.
    stf = out["sustained_bf16_tflops"]
    out["rtt_high"] = bool(out["median_ms"] >= 5.0)
    out["verdict"] = (
        "healthy" if (100.0 <= stf <= 400.0) else "degraded")
    return out


EF_SWEEP = [100, 150, 200, 300, 400, 600]


def bench_ours(x: np.ndarray, q: np.ndarray, k: int, target: float):
    """Build + tune + measure this engine. Returns dict of results."""
    import jax
    import jax.numpy as jnp

    from vector_db_tpu.index import hnsw_kernels as K
    from vector_db_tpu.index.hnsw import HNSW
    from vector_db_tpu.ops.exact import exact_search_tiled

    n = x.shape[0]
    t0 = time.perf_counter()
    index = HNSW(M=16, ef_construction=200, rng=random.Random(42),
                 capacity=n, l_max=5)
    index.bulk_build(list(range(n)), x)
    jax.block_until_ready(index.graph.neighbors)
    build_s = time.perf_counter() - t0

    qd = jnp.asarray(q)
    gt = np.asarray(
        exact_search_tiled(qd, index._emb, index._has_emb, k, tile=25088)[1]
    )

    def run_exact(qv):
        d, i = exact_search_tiled(qv, index._emb, index._has_emb, k,
                                  tile=25088)
        d = np.asarray(d, np.float64)
        return d, d.sum()

    exact_qps, _ = timed_qps(run_exact, qd, len(q), label=f"exact_n{n}")

    chosen = None
    for ef in EF_SWEEP:
        ms = 2 * ef + 16

        def run(qv):
            d, s = K.search_batch(
                index.graph, index._emb, index._has_emb, qv, None,
                M=16, l_max=5, ef=ef, k=k, max_steps=ms,
                use_filter=False, pool=ef, expand=4,
            )
            dd = np.asarray(d, np.float64)
            sig = dd[dd < 1e37].sum()
            return np.asarray(s), sig

        qps, outs = timed_qps(run, qd, len(q), warmups=2, label=f"hnsw_n{n}_ef{ef}")
        rec = recall_at_k(outs[-1], gt, k)
        log(f"  ours n={n} ef={ef}: recall@{k}={rec:.3f} qps={qps:.0f}")
        chosen = {"ef": ef, "recall": rec, "qps": qps}
        if rec >= target:
            break
    chosen["build_s"] = build_s
    chosen["build_vps"] = n / build_s
    chosen["exact_qps"] = exact_qps

    # round-3 wide-beam graph mode (frontier-parallel traversal): one
    # tuned operating point at the same corpus/ground truth
    index.enable_wide()
    ef_w = 512

    def run_wide(qv):
        d, s = index.search_batch_wide(np.asarray(qv), k=k, ef=ef_w)
        dd = np.asarray(d, np.float64)
        return np.asarray(s), dd[dd < 1e37].sum()

    qps_w, outs_w = timed_qps(run_wide, qd, len(q), warmups=3,
                              label=f"hnsw_wide_n{n}")
    rec_w = recall_at_k(outs_w[-1], gt, k)
    log(f"  ours(wide) n={n} ef={ef_w}: recall@{k}={rec_w:.3f} qps={qps_w:.0f}")
    chosen["wide"] = {"ef": ef_w, "recall": rec_w, "qps": qps_w}

    # pool-free beam variant (merge-light traversal) at the same corpus
    def run_beam(qv):
        d, s = index.search_batch_beam(np.asarray(qv), k=k, frontier=64,
                                       steps=12)
        dd = np.asarray(d, np.float64)
        return np.asarray(s), dd[dd < 1e37].sum()

    qps_b, outs_b = timed_qps(run_beam, qd, len(q), warmups=3,
                              label=f"hnsw_beam_n{n}")
    rec_b = recall_at_k(outs_b[-1], gt, k)
    log(f"  ours(beam) n={n} F=64 T=12: recall@{k}={rec_b:.3f} "
        f"qps={qps_b:.0f}")
    chosen["beam"] = {"F": 64, "T": 12, "recall": rec_b, "qps": qps_b}
    return chosen


def bench_reference(x: np.ndarray, q: np.ndarray, k: int, target: float,
                    cache_path: Path, skip: bool):
    """Measure the reference HNSW (pure Python, CPU) at the same config."""
    key = f"n{x.shape[0]}_d{x.shape[1]}_M16_efc200_q{len(q)}"
    if cache_path.exists():
        cached = json.loads(cache_path.read_text())
        if cached.get("key") == key:
            log(f"  reference: using cached measurement {cached}")
            return cached
    if skip:
        log("  reference: no cache and BENCH_SKIP_REF=1 -> vs_baseline null")
        return None

    sys.path.insert(0, "/root/reference/src")
    from vector_db.indexing.hnsw import HNSW as RefHNSW  # noqa: E402
    from vector_db.types import Node as RefNode  # noqa: E402

    n = x.shape[0]
    d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d, axis=1)[:, :k]

    t0 = time.perf_counter()
    ref = RefHNSW(M=16, ef_construction=200, rng=random.Random(42))
    for i in range(n):
        ref.insert_node(RefNode(id=i, embedding=x[i], metadata={}, content=None))
        if i and i % 2000 == 0:
            log(f"  reference build {i}/{n} "
                f"({i / (time.perf_counter() - t0):.0f} vec/s)")
    build_s = time.perf_counter() - t0

    result = None
    for ef in EF_SWEEP:
        t0 = time.perf_counter()
        all_ids = []
        for qi in range(len(q)):
            res = ref.search(q[qi], k=k, ef=ef)
            all_ids.append([node.id for node, _ in res])
        el = time.perf_counter() - t0
        rec = float(np.mean(
            [len(set(all_ids[i]) & set(gt[i])) / k for i in range(len(q))]
        ))
        qps = len(q) / el
        log(f"  reference ef={ef}: recall@{k}={rec:.3f} qps={qps:.0f}")
        result = {"key": key, "ef": ef, "recall": rec, "qps": qps,
                  "build_s": build_s, "build_vps": n / build_s}
        if rec >= target:
            break
    cache_path.write_text(json.dumps(result))
    return result


def bench_scan_headline(n: int, dim: int, n_q: int, k: int):
    """Scan-mode QPS at the north-star corpus shape: f32-exact (recall 1.0
    by construction) and the bf16 + hardware-top-k scan measured against
    the f32 ground truth."""
    import jax
    import jax.numpy as jnp

    from vector_db_tpu.datasets import embedding_like
    from vector_db_tpu.ops.exact import approx_search_tiled, exact_search_tiled

    log(f"generating {n}x{dim} headline corpus...")
    data = embedding_like(n + n_q, dim, seed=1, intrinsic=64)
    x = jnp.asarray(data[:n])
    q = jnp.asarray(data[n:])
    valid = jnp.ones((n,), bool)
    x_bf16 = x.astype(jnp.bfloat16)
    x_sq = jnp.sum(x * x, axis=-1)
    jax.block_until_ready((x_bf16, x_sq))
    tile = 31250 if n % 31250 == 0 else 25000
    tile16 = 125000 if n % 125000 == 0 else tile

    def run_exact(qv):
        d, i = exact_search_tiled(qv, x, valid, k, tile=tile)
        d = np.asarray(d, np.float64)
        return d, d.sum()

    gt = np.asarray(exact_search_tiled(q, x, valid, k, tile=tile)[1])
    exact_qps, _ = timed_qps(run_exact, q, n_q, label=f"headline_exact_{n}")
    log(f"  exact f32 {n // 1000}k x {dim}d: {exact_qps:.0f} qps (recall 1.0)")

    def run_bf16(qv):
        d, i = approx_search_tiled(qv, x_bf16, valid, k, tile=tile16,
                                   x_sq=x_sq)
        sig = float(np.asarray(d, np.float64).sum())
        return np.asarray(i), sig

    bf16_qps, outs = timed_qps(run_bf16, q, n_q, label=f"headline_bf16_{n}")
    bf16_recall = recall_at_k(outs[-1], gt, k)
    log(f"  bf16+hw-topk {n // 1000}k x {dim}d: {bf16_qps:.0f} qps "
        f"(recall@{k}={bf16_recall:.4f} vs f32 exact)")

    # three-phase block-select scan over a PCA-128 bf16 mirror with the
    # fused Pallas phase-1 kernel (ops/exact.py block_select_search_3p):
    # the measured-recall-1.0 throughput mode
    from vector_db_tpu.ops.exact import block_select_search_3p

    cov = np.asarray(jax.jit(
        lambda e: jnp.dot(e.T, e, preferred_element_type=jnp.float32))(x)
    ) / n
    _, vecs = np.linalg.eigh(cov.astype(np.float64))
    proj = jnp.asarray(vecs[:, ::-1][:, :128].astype(np.float32))
    ptab = jnp.dot(x, proj,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    jax.block_until_ready(ptab)

    def run_3p(qv):
        qp = jnp.dot(qv, proj, preferred_element_type=jnp.float32)
        d, i = block_select_search_3p(
            qv, ptab, qp, x_sq, x, valid, k, tile=131072,
            blocks_k=2 * k, rows_k=4 * k, pallas_phase1=True,
            p2_chunk=2)  # EXP_P2CHUNK winner: 39.7k vs 37.5k pipelined
        sig = float(np.asarray(d, np.float64).sum())
        return np.asarray(i), sig

    out = {
        "n": n, "dim": dim,
        "exact_f32": {"qps": exact_qps, "recall": 1.0},
        "bf16_scan": {"qps": bf16_qps, "recall": bf16_recall},
    }
    try:
        p3_qps, outs3 = timed_qps(run_3p, q, n_q, label=f"headline_3p_{n}")
        p3_recall = recall_at_k(outs3[-1], gt, k)
        log(f"  blocksel-3p {n // 1000}k x {dim}d: {p3_qps:.0f} qps "
            f"(recall@{k}={p3_recall:.4f} vs f32 exact)")
        out["blocksel_3p"] = {"qps": p3_qps, "recall": p3_recall}
    except Exception as e:  # never let the extra row kill the headline
        log(f"  blocksel-3p failed: {e!r}")
        out["blocksel_3p_error"] = repr(e)[:300]

    # two-phase block-select: the fused per-block top-m kernel emits row
    # candidates directly (ops/exact.py block_select_search_2p) — the
    # r5 recall-1.0 serving mode
    from vector_db_tpu.ops.exact import block_select_search_2p

    def run_2p(qv):
        qp = jnp.dot(qv, proj, preferred_element_type=jnp.float32)
        d, i = block_select_search_2p(
            qv, ptab, qp, x_sq, x, valid, k, block=128, m=2,
            rows_k=8 * k)  # EXP_2P winner: m=2 73.0k vs m=4 43.7k piped
        sig = float(np.asarray(d, np.float64).sum())
        return np.asarray(i), sig

    try:
        p2_qps, outs2 = timed_qps(run_2p, q, n_q, label=f"headline_2p_{n}")
        p2_recall = recall_at_k(outs2[-1], gt, k)
        log(f"  blocksel-2p {n // 1000}k x {dim}d: {p2_qps:.0f} qps "
            f"(recall@{k}={p2_recall:.4f} vs f32 exact)")
        out["blocksel_2p"] = {"qps": p2_qps, "recall": p2_recall}
    except Exception as e:
        log(f"  blocksel-2p failed: {e!r}")
        out["blocksel_2p_error"] = repr(e)[:300]

    # sustained (queue-depth 8) serving throughput: dispatches overlap
    # so the relay round trip amortizes; recall is the per-call row's
    # (identical program, identical selection)
    def d_bf16(qv):
        return approx_search_tiled(qv, x_bf16, valid, k, tile=tile16,
                                   x_sq=x_sq)[0]

    def d_3p(qv):
        qp = jnp.dot(qv, proj, preferred_element_type=jnp.float32)
        return block_select_search_3p(
            qv, ptab, qp, x_sq, x, valid, k, tile=131072,
            blocks_k=2 * k, rows_k=4 * k, pallas_phase1=True,
            p2_chunk=2)[0]

    try:
        s_bf16 = timed_pipelined(d_bf16, q, n_q,
                                 label=f"headline_bf16_sust_{n}")
        log(f"  bf16 sustained(d8): {s_bf16:.0f} qps")
        out["bf16_scan_sustained"] = {"qps": s_bf16,
                                      "recall": bf16_recall,
                                      "queue_depth": 8}
        if "blocksel_3p" in out:
            s_3p = timed_pipelined(d_3p, q, n_q,
                                   label=f"headline_3p_sust_{n}")
            log(f"  blocksel-3p sustained(d8): {s_3p:.0f} qps")
            out["blocksel_3p_sustained"] = {"qps": s_3p,
                                            "recall": p3_recall,
                                            "queue_depth": 8}
        if "blocksel_2p" in out:
            def d_2p(qv):
                qp = jnp.dot(qv, proj, preferred_element_type=jnp.float32)
                return block_select_search_2p(
                    qv, ptab, qp, x_sq, x, valid, k, block=128, m=2,
                    rows_k=8 * k)[0]

            s_2p = timed_pipelined(d_2p, q, n_q,
                                   label=f"headline_2p_sust_{n}")
            log(f"  blocksel-2p sustained(d8): {s_2p:.0f} qps")
            out["blocksel_2p_sustained"] = {"qps": s_2p,
                                            "recall": p2_recall,
                                            "queue_depth": 8}
    except Exception as e:
        log(f"  sustained rows failed: {e!r}")
        out["sustained_error"] = repr(e)[:300]
    return out


def main() -> None:
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    # a dead relay makes jax.devices() hang FOREVER (no error, no log —
    # the 2026-08-17/18 outage pattern); bound backend discovery so the
    # driver gets a diagnosable JSON line instead of a silent hang
    import signal

    def _dead_relay(*_):
        print(json.dumps({
            "metric": "search_qps_at_recall", "value": 0, "unit": "qps",
            "vs_baseline": 0,
            "error": "TPU backend unreachable (relay down): "
                     "jax.devices() exceeded 600s",
        }))
        os._exit(2)

    signal.signal(signal.SIGALRM, _dead_relay)
    signal.alarm(600)
    import jax

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    signal.alarm(0)
    canary = relay_canary()
    log(f"relay canary: {canary}")

    n = int(os.environ.get("BENCH_N", 100_000))
    headline_n = int(os.environ.get("BENCH_HEADLINE_N", 1_000_000))
    ref_n = int(os.environ.get("BENCH_REF_N", 10_000))
    n_q = int(os.environ.get("BENCH_QUERIES", 1000))
    ref_q = min(n_q, 200)  # reference is ~ms per query; keep its sweep sane
    skip_ref = os.environ.get("BENCH_SKIP_REF", "0") == "1"
    cache_path = Path(os.environ.get("BENCH_REF_CACHE", ".bench_ref.json"))
    dim, k, target = 384, 10, 0.95

    from vector_db_tpu.datasets import embedding_like

    log(f"bench: hnsw_N={n} headline_N={headline_n} ref_N={ref_n} "
        f"queries={n_q} target recall@{k}>={target}")
    data = embedding_like(n + n_q, dim, seed=0)
    x, q = data[:n], data[n:]

    log("== ours: HNSW detail @ N ==")
    ours_hnsw = bench_ours(x, q, k, target)

    log("== ours @ head-to-head N (hnsw + exact) ==")
    ours_small = bench_ours(x[:ref_n], q, k, target)
    ours_small_best = max(ours_small["qps"], ours_small["exact_qps"])

    log("== reference @ head-to-head N ==")
    ref = bench_reference(x[:ref_n], q[:ref_q], k, target, cache_path,
                          skip_ref)

    log("== headline: scan modes @ north-star corpus ==")
    headline = bench_scan_headline(headline_n, 768, n_q, k)
    # a session can degrade mid-run: re-probe after the headline and
    # carry the worse verdict of the two
    canary_post = relay_canary()
    log(f"relay canary (post-headline): {canary_post}")
    if canary_post["verdict"] == "degraded":
        canary = {**canary, "post": canary_post, "verdict": "degraded"}
    else:
        canary = {**canary, "post": canary_post}
    modes = {m: headline[m]
             for m in ("bf16_scan", "blocksel_3p", "blocksel_2p",
                       "exact_f32", "bf16_scan_sustained",
                       "blocksel_3p_sustained", "blocksel_2p_sustained")
             if m in headline and headline[m]["recall"] >= target}
    best_mode = max(modes, key=lambda m: modes[m]["qps"]) \
        if modes else "exact_f32"
    best = headline[best_mode]

    vs_baseline = (ours_small_best / ref["qps"]) if ref else None

    details = {
        "config": {"hnsw_N": n, "headline_N": headline_n, "ref_N": ref_n,
                   "dim": dim, "k": k, "target_recall": target,
                   "M": 16, "ef_construction": 200},
        "headline_1M_768": headline,
        "ours_hnsw_detail": ours_hnsw,
        "ours_matched": {**ours_small, "best_mode_qps": ours_small_best},
        "reference": ref,
        "vs_baseline": vs_baseline,
        "relay_canary": canary,
        "rep_times_s": REP_TIMES,
    }
    Path("BENCH_DETAILS.json").write_text(json.dumps(details, indent=2))
    log(json.dumps(details, indent=2))

    mode_names = {
        "bf16_scan": "bf16 scan + TPU hw top-k",
        "blocksel_3p": "3-phase block-select scan (Pallas fused phase 1)",
        "exact_f32": "f32-exact scan",
        "bf16_scan_sustained":
            "bf16 scan + TPU hw top-k, sustained queue-depth 8",
        "blocksel_3p_sustained":
            "3-phase block-select scan (Pallas fused phase 1), "
            "sustained queue-depth 8",
        "blocksel_2p":
            "2-phase block-select scan (fused per-block top-m kernel)",
        "blocksel_2p_sustained":
            "2-phase block-select scan (fused per-block top-m kernel), "
            "sustained queue-depth 8",
    }
    print(json.dumps({
        "metric": (
            f"QPS/chip at recall@10>=0.95 on 1M x 768-d (best mode: "
            f"{mode_names[best_mode]}, recall {best['recall']:.4f} vs f32 "
            "exact; f32-exact recall-1.0 mode = "
            f"{headline['exact_f32']['qps']:.0f} qps); vs_baseline = "
            f"best-mode QPS ratio vs reference on matched {ref_n // 1000}k "
            f"corpus; relay canary {canary['verdict']} "
            f"({canary['sustained_bf16_tflops']} TFLOP/s sustained, "
            f"{canary['matmul_8192_bf16_tflops']} per-call, "
            f"{canary['median_ms']} ms sync RTT)"
        ),
        "value": round(best["qps"], 1),
        "unit": "qps",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "relay_canary": canary["verdict"],
    }))


if __name__ == "__main__":
    main()
