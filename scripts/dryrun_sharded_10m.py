#!/usr/bin/env python
"""BASELINE config 5 dryrun: 10M x 768 SHARDED across the 8-virtual-device
CPU mesh (multi-chip TPU is not reachable from this environment; the SPMD
program — shard_map + psum/all_gather merge — is what would run on a real
pod slice, so this validates the sharded 10M path compiles AND executes
with measured recall, not absolute TPU throughput).

Mirrors scripts/bench_10m.py's single-chip design, SPMD-ified:
- each shard GENERATES its 1.25M x 768 slice on its own device inside one
  lax.scan (the 30 GB f32 corpus never exists anywhere at once),
- the same scan folds a per-shard exact-f32 top-k for the query set (the
  oracle) and emits the shard's RP-projected augmented mirror + int8
  full-dim rerank mirror,
- search = per-shard two-stage (block-min select on the aug mirror +
  int8 rerank) followed by the cross-shard all-gather top-k merge — the
  same merge ShardedFlatIndex uses (parallel/sharded.py:45-62).

Reference scale story being replaced: full-copy replicas of a 30 GB
Python process (reference README.md:123-126) — the reference cannot
represent this corpus at all. Writes BENCH_SHARDED_10M.json.
"""

import json
import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n_dev = len(jax.devices())
    assert n_dev == 8, jax.devices()
    mesh = Mesh(np.asarray(jax.devices()), ("shard",))

    N = int(os.environ.get("DRYRUN10M_N", 10_000_000))
    DIM, DP, B, K = 768, 128, 16, 10
    CHUNK = 65536
    per_shard = (N + n_dev - 1) // n_dev
    n_chunks = (per_shard + CHUNK - 1) // CHUNK
    shard_pad = n_chunks * CHUNK
    N_pad = shard_pad * n_dev
    INTRINSIC = 64

    key = jax.random.key(11)
    k_mix, k_q = jax.random.split(key)
    mix = jax.random.normal(k_mix, (INTRINSIC, DIM), jnp.float32)
    extra = jax.random.normal(jax.random.fold_in(k_mix, 2),
                              (DIM, DP), jnp.float32)
    _, _, vt = jnp.linalg.svd(mix, full_matrices=False)
    basis, _ = jnp.linalg.qr(jnp.concatenate([vt.T, extra], axis=1))
    proj = basis[:, :DP]

    def gen(k, n):
        z = jax.random.normal(k, (n, INTRINSIC), jnp.float32)
        x = z @ mix + 0.12 * jax.random.normal(
            jax.random.fold_in(k, 1), (n, DIM), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    queries = gen(k_q, B)
    q_sq = jnp.sum(queries * queries, axis=1)

    # shard ids [n_dev] seed each shard's generator chain
    shard_ids = jax.device_put(
        jnp.arange(n_dev, dtype=jnp.int32),
        NamedSharding(mesh, P("shard")))

    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=(P("shard"), P(None, None)),
             out_specs=(P("shard", None), P("shard", None, None),
                        P("shard", None), P("shard", None),
                        P("shard", None), P("shard")))
    def build_shard(sid, qs):
        sid = sid[0]

        def body(carry, ci):
            bd, bi = carry
            k = jax.random.fold_in(jax.random.fold_in(
                jax.random.key(23), sid), ci)
            x = gen(k, CHUNK)
            base = sid * shard_pad + ci * CHUNK
            row_ok = (ci * CHUNK + jnp.arange(CHUNK)) < per_shard
            xsq = jnp.where(row_ok, jnp.sum(x * x, axis=1), 3e38)
            d = (q_sq[:, None] - 2.0 * jnp.dot(qs, x.T) + xsq[None, :])
            nd, pos = jax.lax.top_k(-d, K)
            md, mi = jax.lax.top_k(jnp.concatenate([-bd, nd], axis=1), K)
            mids = jnp.take_along_axis(
                jnp.concatenate([bi, base + pos], axis=1), mi, axis=1)
            xm = jnp.dot(x, proj)
            aug = jnp.concatenate(
                [-2.0 * xm, xsq[:, None],
                 jnp.zeros((CHUNK, 7), jnp.float32)], axis=1)
            scale = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-9) / 127.0
            xi8 = jnp.round(x / scale[:, None]).astype(jnp.int8)
            return (-md, mids), (aug, xi8, scale, xsq)

        # the carry becomes shard-varying inside the scan (it folds
        # sid-dependent chunks); the init must carry the same varying
        # manual axes or shard_map rejects the scan body
        init = jax.lax.pcast(
            (jnp.full((B, K), 3e38, jnp.float32),
             jnp.full((B, K), -1, jnp.int32)),
            ("shard",), to="varying")
        (gd, gi), (aug, xi8, scales, xsq) = jax.lax.scan(
            body, init, jnp.arange(n_chunks, dtype=jnp.int32))
        return (gd.reshape(1, -1), aug.reshape(1, shard_pad, DP + 8),
                xi8.reshape(1, shard_pad * DIM),
                scales.reshape(1, shard_pad), xsq.reshape(1, shard_pad),
                gi.reshape(1, -1))

    log(f"building {N}x{DIM} sharded tables on the {n_dev}-device mesh "
        f"({n_chunks} chunks x {n_dev} shards)...")
    t0 = time.perf_counter()
    gd_s, aug, xi8, scales, xsq, gi_s = build_shard(shard_ids, queries)
    jax.block_until_ready(aug)
    build_s = time.perf_counter() - t0
    log(f"gen+gt+mirrors: {build_s:.0f}s")

    # merge the 8 per-shard GT folds on host (tiny: [8, B*K])
    gd_h = np.asarray(gd_s).reshape(n_dev, B, K)
    gi_h = np.asarray(gi_s).reshape(n_dev, B, K)
    alld = np.moveaxis(gd_h, 0, 1).reshape(B, -1)
    alli = np.moveaxis(gi_h, 0, 1).reshape(B, -1)
    order = np.argsort(alld, axis=1)[:, :K]
    gt = np.take_along_axis(alli, order, axis=1)

    n_blocks = shard_pad // 128
    qm = jnp.dot(queries, proj)

    @partial(jax.jit, static_argnames=("blocks_k",))
    @partial(shard_map, mesh=mesh,
             in_specs=(P("shard", None, None), P("shard", None),
                       P("shard", None), P("shard", None),
                       P(None, None), P(None, None)),
             out_specs=(P(None, None), P(None, None)),
             check_rep=False)
    def search(aug, xi8, scales, xsq, qs, qm, blocks_k=32):
        sid = jax.lax.axis_index("shard")
        aug = aug[0]
        xi8 = xi8[0].reshape(shard_pad, DIM)
        scales, xsq = scales[0], xsq[0]
        qa = jnp.concatenate(
            [qm, jnp.ones((B, 1), jnp.float32),
             jnp.zeros((B, 7), jnp.float32)], axis=1)
        # largest CHUNK multiple <= 4 chunks that divides the shard
        tile = CHUNK * max(m for m in range(1, 5) if n_chunks % m == 0)

        def p1(_, t):
            blk = jax.lax.dynamic_slice(aug, (t * tile, 0),
                                        (tile, DP + 8))
            d = jnp.dot(qa, blk.T)
            return None, jnp.min(d.reshape(B, tile // 128, 128), axis=-1)

        _, mins = jax.lax.scan(
            p1, None, jnp.arange(shard_pad // tile, dtype=jnp.int32))
        mins = jnp.moveaxis(mins, 0, 1).reshape(B, n_blocks)
        _, bidx = jax.lax.approx_min_k(mins, blocks_k)
        rows = xi8.reshape(n_blocks, 128, DIM)[bidx]
        sc = scales.reshape(n_blocks, 128)[bidx]
        xq = xsq.reshape(n_blocks, 128)[bidx]
        dots = jnp.einsum("qcbd,qd->qcb", rows.astype(jnp.float32), qs)
        d = xq - 2.0 * sc * dots + jnp.sum(qs * qs, axis=1)[:, None, None]
        d = d.reshape(B, -1)
        neg, pos = jax.lax.top_k(-d, K)
        gids = (sid * shard_pad + bidx[:, :, None] * 128
                + jnp.arange(128, dtype=jnp.int32)[None, None, :]
                ).reshape(B, -1)
        lids = jnp.take_along_axis(gids, pos, axis=1)
        # cross-shard merge: all_gather the [B, K] candidates, global top-k
        ad = jax.lax.all_gather(-neg, "shard", axis=1).reshape(B, -1)
        ai = jax.lax.all_gather(lids, "shard", axis=1).reshape(B, -1)
        md, mp = jax.lax.top_k(-ad, K)
        return -md, jnp.take_along_axis(ai, mp, axis=1)

    log("sharded two-stage search (compile + run)...")
    t0 = time.perf_counter()
    d, ids = search(aug, xi8, scales, xsq, queries, qm)
    ids = np.asarray(ids)
    search_s = time.perf_counter() - t0
    rec = float(np.mean([
        len(set(ids[i].tolist()) & set(gt[i].tolist())) / K
        for i in range(B)]))
    log(f"recall@{K}={rec:.4f} (compile+run {search_s:.0f}s)")

    t0 = time.perf_counter()
    d, ids2 = search(aug, xi8, scales, xsq,
                     queries * (1.0 + 1e-6), qm * (1.0 + 1e-6))
    np.asarray(ids2)
    warm_s = time.perf_counter() - t0

    out = {"N": N, "dim": DIM, "dp": DP, "mesh_devices": n_dev,
           "platform": "cpu (virtual 8-device mesh)", "executed": True,
           "build_s": build_s, "recall_at_10": rec,
           "search_warm_s": warm_s, "queries": B,
           "memory_gb_total": {
               "aug_f32": round(N_pad * (DP + 8) * 4 / 1e9, 2),
               "int8_mirror": round(N_pad * DIM / 1e9, 2)},
           "note": "SPMD shard_map program identical to the pod-slice "
                   "path; absolute QPS not meaningful on a 1-core host"}
    Path("BENCH_SHARDED_10M.json").write_text(json.dumps(out, indent=2))
    log(json.dumps(out))


if __name__ == "__main__":
    main()
