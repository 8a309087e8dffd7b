#!/usr/bin/env python
"""Per-component cost profile of the wide-beam step at 1M x 768.

Re-times the full search with individual step components surgically
disabled (constant-folded) — the deltas attribute the ~100 ms/step cost.
Reuses /tmp/wide1m_cache. Writes EXP_WIDE_PROFILE.json.
"""

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from exp_wide_1m import get_index, log  # noqa: E402


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vector_db_tpu.index import wide_beam as WB
    from vector_db_tpu.ops.distance import BIG

    BIG_THRESH = np.float32(1e37)
    N, DIM, B = 1_000_000, 768, 1000
    index, x, q, gt = get_index(N, DIM, B)
    index.enable_wide(dims=128, seeds=16384, inline=True)
    aug, seeds = index._wide_tables()
    nbr_i8, nbr_scale, nbr_xsq = index._wb_inline_tabs
    nbr0 = index.graph.neighbors[:, : 2 * 16]
    qd = jnp.asarray(q)
    qa = WB.aug_queries(qd, index._wb_proj, aug.shape[1])

    ef, F, T = 1536, 192, 12
    dp = nbr_i8.shape[-1]

    @functools.partial(
        jax.jit,
        static_argnames=("skip",),
    )
    def probe(aug, seeds, nbr0, nbr_i8, nbr_scale, nbr_xsq, queries_aug,
              salt, skip):
        Bq = queries_aug.shape[0]
        P = ef
        qa16 = (queries_aug + salt * 1e-9).astype(jnp.bfloat16)
        seed_rows = aug[jnp.maximum(seeds, 0)]
        d_seed = jnp.dot(qa16, seed_rows.T.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        d_seed = jnp.where(seeds[None, :] >= 0, d_seed, BIG)
        seed_b = jnp.broadcast_to(seeds[None, :], (Bq, seeds.shape[0]))
        pool_d, pos = jax.lax.approx_min_k(d_seed, P)
        pool_s = jnp.take_along_axis(seed_b, pos, axis=1)
        pool_e = jnp.zeros((Bq, P), bool)

        def step(carry, _):
            pool_d, pool_s, pool_e = carry
            unexp = jnp.where(pool_e | (pool_s < 0), BIG, pool_d)
            if "pop" in skip:
                fpos = jnp.broadcast_to(
                    jnp.arange(F, dtype=jnp.int32)[None, :], (Bq, F))
                fd = jnp.take_along_axis(unexp, fpos, axis=1)
            else:
                fd, fpos = jax.lax.approx_min_k(unexp, F)
            frontier = jnp.take_along_axis(pool_s, fpos, axis=1)
            fvalid = (fd < BIG_THRESH) & (frontier >= 0)
            frontier = jnp.where(fvalid, frontier, -1)
            if "hit" in skip:
                pool_e = pool_e.at[
                    jnp.arange(Bq)[:, None], fpos].set(True)
            else:
                hit = jnp.any(
                    (pool_s[:, :, None] == frontier[:, None, :])
                    & fvalid[:, None, :], axis=-1)
                pool_e = pool_e | hit
            f_safe = jnp.maximum(frontier, 0)
            if "candgather" in skip:
                cand = jnp.broadcast_to(
                    jnp.arange(F * 32, dtype=jnp.int32)[None, :],
                    (Bq, F * 32))
            else:
                cand = nbr0[f_safe]
                cand = jnp.where(fvalid[:, :, None], cand, -1)
                cand = cand.reshape(Bq, -1)
            if "blockgather" in skip:
                blk = jnp.zeros((Bq, F, 32, dp), jnp.int8)
            else:
                blk = nbr_i8[f_safe]
            if "auxgather" in skip:
                scl = jnp.ones((Bq, F, 32), jnp.float32)
                nxq = jnp.ones((Bq, F, 32), jnp.float32)
            else:
                scl = nbr_scale[f_safe]
                nxq = nbr_xsq[f_safe]
            if "einsum" in skip:
                d_new = nxq.reshape(Bq, -1)
            else:
                qm16 = queries_aug[:, :dp].astype(jnp.bfloat16)
                dots = jnp.einsum(
                    "bfnd,bd->bfn", blk.astype(jnp.bfloat16), qm16,
                    preferred_element_type=jnp.float32)
                d_new = (nxq - 2.0 * scl * dots).reshape(Bq, -1)
            d_new = jnp.where(cand >= 0, d_new, BIG)
            cat_d = jnp.concatenate([pool_d, d_new], axis=1)
            cat_s = jnp.concatenate([pool_s, cand], axis=1)
            cat_e = jnp.concatenate(
                [pool_e, jnp.zeros_like(d_new, bool)], axis=1)
            if "merge" in skip:
                pool_d2 = cat_d[:, :P]
                mi = jnp.broadcast_to(
                    jnp.arange(P, dtype=jnp.int32)[None, :], (Bq, P))
            else:
                pool_d2, mi = jax.lax.approx_min_k(cat_d, P)
            pool_d = pool_d2
            if "taa" in skip:
                pool_s = cat_s[:, :P]
                pool_e = cat_e[:, :P]
            else:
                pool_s = jnp.take_along_axis(cat_s, mi, axis=1)
                pool_e = jnp.take_along_axis(cat_e, mi, axis=1)
            pool_s = jnp.where(pool_d < BIG_THRESH, pool_s, -1)
            if "dedup" not in skip:
                dup = jnp.zeros_like(pool_e)
                prop = pool_e
                for w in range(1, 17):
                    s_r = jnp.pad(pool_s[:, :-w], ((0, 0), (w, 0)),
                                  constant_values=-2)
                    e_r = jnp.pad(prop[:, :-w], ((0, 0), (w, 0)),
                                  constant_values=False)
                    s_l = jnp.pad(pool_s[:, w:], ((0, 0), (0, w)),
                                  constant_values=-2)
                    e_l = jnp.pad(prop[:, w:], ((0, 0), (0, w)),
                                  constant_values=False)
                    eq_r = pool_s == s_r
                    prop = prop | (eq_r & e_r) | ((pool_s == s_l) & e_l)
                    dup = dup | eq_r
                pool_e = prop | dup
                pool_d = jnp.where(dup, BIG, pool_d)
                pool_s = jnp.where(dup, -1, pool_s)
            return (pool_d, pool_s, pool_e), None

        (pool_d, pool_s, pool_e), _ = jax.lax.scan(
            step, (pool_d, pool_s, pool_e), None, length=T)
        return pool_d.sum() + pool_s.sum().astype(jnp.float32)

    variants = ["none", "pop", "hit", "candgather", "blockgather",
                "auxgather", "einsum", "merge", "taa", "dedup",
                "blockgather+auxgather+einsum"]
    out = {}
    for v in variants:
        skip = tuple(v.split("+")) if v != "none" else ()
        f = lambda s: probe(aug, seeds, nbr0, nbr_i8, nbr_scale,  # noqa: E731
                            nbr_xsq, qa, jnp.float32(s), skip)
        float(f(0.0))  # compile+warm
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            float(f(float(r + 1)))
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        out[v] = round(t, 4)
        log(f"skip={v}: {t:.3f}s")

    base = out["none"]
    log("deltas (cost attribution):")
    for v, t in out.items():
        if v != "none":
            log(f"  {v}: {base - t:+.3f}s")
    Path("EXP_WIDE_PROFILE.json").write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
