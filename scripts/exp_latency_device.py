#!/usr/bin/env python
"""Device-attributed B=1 latency for the 1M x 768 flagship scan modes
(VERDICT r5 #8: make the 2.45 / 11.2 ms device estimates solid).

Methodology — loop-slope, not trace parsing (no xplane reader in this
image): run the search body R times inside ONE dispatched program
(lax.fori_loop, query perturbed per iteration so XLA cannot collapse
iterations), for two loop lengths R1 < R2. Then

    device_ms = (wall(R2) - wall(R1)) / (R2 - R1)

which cancels the relay RTT, dispatch overhead, and any constant
program prologue exactly — a stricter attribution than the
RTT-subtracted estimates in BENCH_LATENCY.json (device_ms_est). A raw
jax.profiler trace is also captured for the record (artifact dir noted
in the JSON). Writes EXP_LAT_DEVICE.json.
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CACHE = Path("/tmp/wide1m_cache")
N, DIM, K = 1_000_000, 768, 10
R1, R2 = 4, 16


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vector_db_tpu.ops.exact import (
        approx_search_tiled,
        block_select_search_2p,
        block_select_search_3p,
        rescore_exact,
    )

    data = np.load(CACHE / "data.npy", mmap_mode="r")
    x = jnp.asarray(np.asarray(data[:N]))
    q1 = jnp.asarray(np.asarray(data[N : N + 1]))  # B=1
    valid = jnp.ones((N,), bool)
    x_sq = jnp.sum(x * x, axis=-1)
    x16 = x.astype(jnp.bfloat16)

    cov = np.asarray(jax.jit(
        lambda e: jnp.dot(e.T, e, preferred_element_type=jnp.float32))(x)
    ) / N
    _, vecs = np.linalg.eigh(cov.astype(np.float64))
    proj = jnp.asarray(vecs[:, ::-1][:, :128].astype(np.float32))
    ptab = jnp.dot(x, proj,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    jax.block_until_ready((ptab, x_sq, x16))

    # the 1M tables (x 3 GB, x16 1.5 GB, ptab 0.25 GB) are threaded
    # through as jit ARGUMENTS: closing over them captures them as
    # lowering constants (4.6 GB) and the compile never returns — same
    # trap bench_10m.py documents
    tabs = (x, x16, x_sq, ptab, proj, valid)

    def bf16_body(qv, tabs):
        x, x16, x_sq, ptab, proj, valid = tabs
        _, slots = approx_search_tiled(qv, x16, valid, K, tile=125000,
                                       x_sq=x_sq)
        return rescore_exact(qv, x, slots)[1]

    def p3_body(qv, tabs):
        x, x16, x_sq, ptab, proj, valid = tabs
        sq = jnp.dot(qv, proj, preferred_element_type=jnp.float32)
        return block_select_search_3p(
            qv, ptab, sq, x_sq, x, valid, K, tile=131072, blocks_k=20,
            rows_k=80, pallas_phase1=True, p2_chunk=2)[1]

    def p2_body(qv, tabs):
        x, x16, x_sq, ptab, proj, valid = tabs
        sq = jnp.dot(qv, proj, preferred_element_type=jnp.float32)
        return block_select_search_2p(
            qv, ptab, sq, x_sq, x, valid, K, block=128, m=4, rows_k=80)[1]

    out = {"N": N, "B": 1, "method": "loop-slope (R2-R1 fori_loop)",
           "R1": R1, "R2": R2, "rows": []}

    for label, body in (("bf16_scan", bf16_body),
                        ("blocksel_3p", p3_body),
                        ("blocksel_2p", p2_body)):
        try:
            @partial(jax.jit, static_argnames=("reps",))
            def looped(qv, tabs, reps):
                def it(i, acc):
                    ids = body(qv * (1.0 + 1e-7 * i.astype(jnp.float32)),
                               tabs)
                    return acc + jnp.sum(ids)

                return jax.lax.fori_loop(0, reps, it, jnp.int32(0))

            def wall(reps):
                looped(q1, tabs, reps).block_until_ready()  # warm/compile
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    looped(q1, tabs, reps).block_until_ready()
                    ts.append(time.perf_counter() - t0)
                return float(np.median(ts))

            w1, w2 = wall(R1), wall(R2)
            dev_ms = (w2 - w1) / (R2 - R1) * 1e3
            # single-dispatch wall for context (RTT-bound)
            t0 = time.perf_counter()
            body_j = jax.jit(body)
            body_j(q1, tabs).block_until_ready()
            ts = []
            for r in range(10):
                v = q1 * (1.0 + (r + 1) * 1e-6)
                t0 = time.perf_counter()
                body_j(v, tabs).block_until_ready()
                ts.append(time.perf_counter() - t0)
            row = {"label": label,
                   "device_ms_slope": round(dev_ms, 3),
                   "wall_R1_s": round(w1, 4), "wall_R2_s": round(w2, 4),
                   "single_dispatch_wall_ms":
                       round(float(np.median(ts)) * 1e3, 2)}
        except Exception as e:
            row = {"label": label, "error": repr(e)[:300]}
        log(f"{row}")
        out["rows"].append(row)
        Path("EXP_LAT_DEVICE.json").write_text(json.dumps(out, indent=1))

    # raw profiler trace of one B=1 dispatch per mode, for the record
    try:
        tdir = "/tmp/lat_trace"
        jax.profiler.start_trace(tdir)
        for body in (bf16_body, p3_body, p2_body):
            jax.jit(body)(q1, tabs).block_until_ready()
        jax.profiler.stop_trace()
        out["trace_dir"] = tdir
    except Exception as e:
        out["trace_error"] = repr(e)[:200]
    Path("EXP_LAT_DEVICE.json").write_text(json.dumps(out, indent=1))
    log("done")


if __name__ == "__main__":
    main()
