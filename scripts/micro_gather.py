#!/usr/bin/env python
"""Microbenchmark: TPU rates for the primitives a graph-search kernel is
built from. Informs the wide-beam design (round-3 flagship).

The axon relay has a ~25-30 ms per-call synchronization floor, so each
primitive is looped ITERS times inside ONE jitted program (lax.fori_loop,
data-dependent carry so nothing folds away); per-op time = (t_loop -
t_overhead) / ITERS. Results are forced to host with float() — through the
relay, block_until_ready alone under-reports.

Writes MICRO_GATHER.json; progress to stderr.
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ITERS = 64


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, reps=3, warm=2):
    ts = []
    for i in range(warm + reps):
        t0 = time.perf_counter()
        float(fn(i))  # force full sync to host
        t = time.perf_counter() - t0
        if i >= warm:
            ts.append(t)
    return float(np.median(ts))


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    N = 1_000_000
    out = {}

    @partial(jax.jit, static_argnames=("n", "w", "dt"))
    def make_table(n, w, dt):
        r = jnp.arange(n, dtype=jnp.int32)[:, None] * 7 + \
            jnp.arange(w, dtype=jnp.int32)[None, :] * 13
        return ((r % 251) - 125).astype(dt)

    # relay overhead floor: empty-ish program
    @jax.jit
    def floor_fn(s):
        return s * 1.000001

    t_floor = timeit(lambda i: floor_fn(jnp.float32(i)))
    out["relay_floor_ms"] = round(t_floor * 1e3, 2)
    log(f"relay floor: {t_floor * 1e3:.2f} ms")

    # --- 1. row gathers, looped in-program ---
    @partial(jax.jit, static_argnames=("r",))
    def gather_loop(table, idx0, salt, r):
        n = table.shape[0]

        def body(i, acc):
            # derived indices: new rows each iteration, defeats CSE
            idx = (idx0 + i * 131) % n
            return acc + jnp.sum(table[idx].astype(jnp.float32))

        return jax.lax.fori_loop(0, ITERS, body, salt)

    for name, width, dt in [
        ("i32_32", 32, jnp.int32),
        ("i8_128", 128, jnp.int8),
        ("bf16_128", 128, jnp.bfloat16),
        ("bf16_136", 136, jnp.bfloat16),   # augmented RP row (rp, xsq)
        ("f32_768", 768, jnp.float32),
        ("i8_4096", 4096, jnp.int8),       # inline 32x128 int8 block
        ("bf16_2176", 2176, jnp.bfloat16),  # inline 32x68 bf16 block
    ]:
        table = make_table(N, width, dt)
        jax.block_until_ready(table)
        bytes_per = width * table.dtype.itemsize
        for r in (1024, 8192, 131072):
            idx0 = jnp.asarray(
                rng.integers(0, N, size=(r,)).astype(np.int32))
            t = timeit(lambda i: gather_loop(table, idx0,
                                             jnp.float32(i), r))
            per = max(t - t_floor, 1e-9) / ITERS
            out[f"gather_{name}_r{r}"] = {
                "us": round(per * 1e6, 1),
                "Mrows_s": round(r / per / 1e6, 2),
                "GB_s": round(r * bytes_per / per / 1e9, 1),
            }
            log(f"gather {name} r={r}: {per * 1e6:.0f} us/op "
                f"{r / per / 1e6:.1f} Mrows/s "
                f"{r * bytes_per / per / 1e9:.0f} GB/s")
        del table

    # --- 2. take_along_axis pool-sized ---
    B, P, K = 1024, 512, 1536
    src = make_table(B, K, jnp.float32)
    idx2 = jnp.asarray(rng.integers(0, K, size=(B, P)).astype(np.int32))

    @jax.jit
    def taa_loop(s, ix, salt):
        def body(i, acc):
            v = jnp.take_along_axis(s + acc * 1e-9, (ix + i) % K, axis=1)
            return acc + jnp.sum(v)

        return jax.lax.fori_loop(0, ITERS, body, salt)

    t = timeit(lambda i: taa_loop(src, idx2, jnp.float32(i)))
    per = max(t - t_floor, 1e-9) / ITERS
    out[f"take_along_axis_B{B}_P{P}_K{K}"] = {"us": round(per * 1e6, 1)}
    log(f"take_along_axis [B={B},{K}]->[{P}]: {per * 1e6:.0f} us/op")

    # --- 3. visited-style scatter+gather [B, N] int8 ---
    Bv = 128
    visited = jnp.zeros((Bv, N), jnp.int8)
    vidx = jnp.asarray(
        rng.integers(0, N, size=(Bv, 1024)).astype(np.int32))

    @jax.jit
    def scatgath_loop(v, ix, salt):
        bi = jnp.arange(Bv, dtype=jnp.int32)[:, None]

        def body(i, carry):
            acc, v = carry
            ixi = (ix + i * 97) % N
            v = v.at[bi, ixi].set(jnp.int8(1))
            got = jnp.take_along_axis(v, (ixi + 13) % N, axis=1)
            return acc + jnp.sum(got.astype(jnp.float32)), v

        acc, _ = jax.lax.fori_loop(0, ITERS, body, (salt, v))
        return acc

    t = timeit(lambda i: scatgath_loop(visited, vidx, jnp.float32(i)))
    per = max(t - t_floor, 1e-9) / ITERS
    out["visited_scatter_gather_B128_K1024"] = {"us": round(per * 1e6, 1)}
    log(f"visited scatter+gather [128,1M] K=1024: {per * 1e6:.0f} us/op")
    del visited

    # --- 4. approx_min_k vs top_k, in-program ---
    for KK in (1536, 8192):
        src2 = make_table(B, KK, jnp.float32)

        @partial(jax.jit, static_argnames=("mode",))
        def red_loop(s, salt, mode):
            def body(i, acc):
                ss = s + acc * 1e-12
                if mode == "approx":
                    v, ix = jax.lax.approx_min_k(ss, 512)
                else:
                    v, ix = jax.lax.top_k(-ss, 512)
                return acc + v.sum() + ix.sum().astype(jnp.float32)

            return jax.lax.fori_loop(0, ITERS, body, salt)

        for mode in ("approx", "topk"):
            t = timeit(lambda i: red_loop(src2, jnp.float32(i), mode))
            per = max(t - t_floor, 1e-9) / ITERS
            out[f"{mode}_B{B}_K{KK}_k512"] = {"us": round(per * 1e6, 1)}
            log(f"{mode:6s} [B={B},{KK}]->512: {per * 1e6:.0f} us/op")

    # --- 5. batched GEMV scoring ---
    for Bq, C in [(128, 1024), (1024, 1024)]:
        m = make_table(Bq * C, 128, jnp.int8).reshape(Bq, C, 128)
        qm = make_table(Bq, 128, jnp.float32)

        @jax.jit
        def gemv_loop(m, qm, salt):
            def body(i, acc):
                q = qm + acc * 1e-12
                s = jnp.einsum(
                    "bcd,bd->bc", m.astype(jnp.bfloat16),
                    q.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
                return acc + s.sum()

            return jax.lax.fori_loop(0, ITERS, body, salt)

        t = timeit(lambda i: gemv_loop(m, qm, jnp.float32(i)))
        per = max(t - t_floor, 1e-9) / ITERS
        out[f"gemv_B{Bq}_C{C}"] = {"us": round(per * 1e6, 1)}
        log(f"gemv int8 [B={Bq},{C},128]: {per * 1e6:.0f} us/op")

    # --- 6. broadcast-compare dedup ---
    for Bq in (128, 1024):
        cand = jnp.asarray(
            rng.integers(0, N, size=(Bq, 1024)).astype(np.int32))
        pool = jnp.asarray(
            rng.integers(0, N, size=(Bq, 512)).astype(np.int32))

        @jax.jit
        def dedup_loop(c, p, salt):
            def body(i, acc):
                seen = jnp.any((c + i)[:, :, None] == p[:, None, :], axis=-1)
                return acc + seen.sum().astype(jnp.float32)

            return jax.lax.fori_loop(0, ITERS, body, salt)

        t = timeit(lambda i: dedup_loop(cand, pool, jnp.float32(i)))
        per = max(t - t_floor, 1e-9) / ITERS
        out[f"dedup_cmp_B{Bq}_K1024_P512"] = {"us": round(per * 1e6, 1)}
        log(f"dedup cmp [B={Bq},1024x512]: {per * 1e6:.0f} us/op")

    Path("MICRO_GATHER.json").write_text(json.dumps(out, indent=2))
    log("wrote MICRO_GATHER.json")


if __name__ == "__main__":
    main()
