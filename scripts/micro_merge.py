#!/usr/bin/env python
"""Micro-benchmark: Pallas bitonic pool merge vs the XLA formulation.

Times the wide-beam step's pool-maintenance pattern at the production
shape ([B, P+K] -> top-P with an int32 payload): (a) approx_min_k +
take_along_axis (what wide_search does today), (b) the bitonic
sort-by-key kernel. Writes MICRO_MERGE.json. Run on the real chip:
python scripts/micro_merge.py
"""

import json
import os
import sys
import time
import traceback
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, d, v, reps=5):
    """Median wall-clock of fn(d_r, v) over per-rep DISTINCT key tensors.

    Identical args every rep let the relay's (executable, inputs)
    memoization return cached results (measured: 0.06 ms for a 65 MB
    merge — over HBM speed-of-light). The perturbation must survive the
    key dtype: 1e-6 rounds away in bf16 (eps 2^-8), so scale by
    rep-distinct factors >= 1%, applied in f32 BEFORE the cast."""
    import jax
    import jax.numpy as jnp

    variants = [
        (d.astype(jnp.float32) * (1.0 + 0.01 * (r + 1))).astype(d.dtype)
        for r in range(reps)
    ]
    jax.block_until_ready(variants)
    jax.block_until_ready(fn(d, v))
    ts = []
    for dr in variants:
        t0 = time.perf_counter()
        out = fn(dr, v)
        # force FULL execution with a host-visible scalar: on the relay
        # backend block_until_ready alone has produced sub-roundtrip
        # timings for small outputs (MICRO_ADC_PROBE gather rows at
        # 0.1 ms — less than its own rerank's gather cost)
        float(jnp.sum(out[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import functools

    import jax
    import jax.numpy as jnp

    from vector_db_tpu.ops.pallas.bitonic_merge import sorted_topk

    log(str(jax.devices()))
    out = {}
    rng = np.random.default_rng(0)
    for B, P, K in [(1000, 1280, 3584), (1000, 1536, 3840),
                    (128, 1280, 3584)]:
        n = P + K
        d = jnp.asarray(rng.random((B, n)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        v = jnp.asarray(rng.integers(0, 1 << 21, (B, n)).astype(np.int32))
        key = f"B{B}_P{P}_K{K}"
        row = {}

        @jax.jit
        def xla_merge(d, v):
            pd, mi = jax.lax.approx_min_k(d.astype(jnp.float32), P)
            return pd, jnp.take_along_axis(v, mi, axis=1)

        try:
            row["xla_approx_taa_ms"] = round(
                timeit(xla_merge, d, v) * 1e3, 2)
        except Exception:
            row["xla_approx_taa_ms"] = traceback.format_exc()[-500:]

        # block_b=64 OOMs scoped VMEM at n=8192 (22.9M > 16M, measured)
        # and the presorted network lost 500x to the full sort on-chip
        # (28-35 ms vs 0.06; also invalid under the window dedup — see
        # wide_beam.py) — neither earns its ~13-min Mosaic compile here.
        # MICRO_MERGE_ALL=1 restores both for the record.
        blocks = (32, 64) if os.environ.get("MICRO_MERGE_ALL") else (32,)
        for bb in blocks:
            try:
                f = functools.partial(sorted_topk, topk=P, block_b=bb)
                jf = jax.jit(lambda d, v, f=f: f(d, v))
                row[f"bitonic_b{bb}_ms"] = round(timeit(jf, d, v) * 1e3, 2)
                # correctness vs host (top-P set by key)
                od, ov = jf(d, v)
                dd = np.asarray(d, np.float32)
                want = np.sort(dd, axis=1)[:, :P]
                got = np.sort(np.asarray(od, np.float32), axis=1)
                row[f"bitonic_b{bb}_exact"] = bool(
                    np.allclose(got, want))
            except Exception:
                row[f"bitonic_b{bb}_ms"] = traceback.format_exc()[-1500:]

        if os.environ.get("MICRO_MERGE_ALL"):
            # presorted path (dedup_window=0 only; see wide_beam.py)
            dp = jnp.sort(d[:, :P].astype(jnp.float32), axis=1
                          ).astype(d.dtype)
            dpre = jnp.concatenate([dp, d[:, P:]], axis=1)
            for bb in blocks:
                try:
                    f = functools.partial(sorted_topk, topk=P, block_b=bb,
                                          presorted=P)
                    jf = jax.jit(lambda d, v, f=f: f(d, v))
                    row[f"presorted_b{bb}_ms"] = round(
                        timeit(jf, dpre, v) * 1e3, 2)
                    od, _ = jf(dpre, v)
                    want = np.sort(np.asarray(dpre, np.float32),
                                   axis=1)[:, :P]
                    row[f"presorted_b{bb}_exact"] = bool(np.allclose(
                        np.sort(np.asarray(od, np.float32), axis=1), want))
                except Exception:
                    row[f"presorted_b{bb}_ms"] = \
                        traceback.format_exc()[-1500:]
        out[key] = row
        log(f"{key}: {row}")

    Path("MICRO_MERGE.json").write_text(json.dumps(out, indent=1))
    log("wrote MICRO_MERGE.json")


if __name__ == "__main__":
    main()
