"""Fused pool-merge kernel: bitonic sort-by-key with an int32 payload.

The wide-beam step's dominant cost at 1M is pool maintenance
(EXP_WIDE_PROFILE.json: merge 0.33s + pool-permutation gather 0.36s per
1000-query batch, of a 0.87s step): XLA lowers the [B, P+K] partial
reduce at P ~ 0.25·(P+K) to a near-full variadic sort, and the payload
permutation is an issue-bound gather. This kernel does the whole thing
in VMEM: one bitonic sort of the concatenated (distance, payload) pair
per query row — ~log²(n) vectorized compare-exchange stages with no HBM
round trips and no separate permutation pass (the payload rides the
exchanges).

Shapes: n (pad-to-pow2 of P+K) up to 8192 at f32+i32 keeps a 64-row
query block under ~5 MB of VMEM. The grid iterates over query blocks;
every block is independent (no revisited outputs).

Correctness contract (tests/ops/test_bitonic_merge.py): ascending by
key with the payload carried through each exchange; the first P columns
are the EXACT top-P smallest — strictly stronger than the
``approx_min_k`` merge it replaces. Order among equal keys is
arbitrary (the in-pair tie-break uses the current slot, which is enough
for a conservative exchange but not for global stability); equal keys
still land adjacent, which is all the wide-beam window dedup needs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.0e38


def _kernel(d_ref, v_ref, out_d_ref, out_v_ref, *, n, topk):
    # Keys are compared in f32 regardless of input dtype: f32 and the
    # i32 payload share the native (8, 128) tiling, so the exchange
    # masks keep one layout. With bf16 keys the masks straddle the
    # packed (16, 128) bf16 tiling and the (8, 128) i32 tiling, which
    # Mosaic rejects ("Invalid relayout … replicated in destination",
    # BENCH_PALLAS round 3). bf16→f32 is exact, so compares are too.
    d = d_ref[:].astype(jnp.float32)   # f32[Bb, n]
    v = v_ref[:]                       # i32[Bb, n]
    b = d.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)

    ksz = 2
    while ksz <= n:
        j = ksz // 2
        while j >= 1:
            # partner = pos ^ j via two static lane rotates: lanes with
            # bit j clear read pos+j (roll left), the rest pos-j (roll
            # right). pos^j never leaves [0, n), so the circular
            # wrap-around lanes are exactly the ones the select drops.
            # (A reshape-to-(…, 2, j) pair swap is an unsupported Mosaic
            # shape cast for small j — MICRO_MERGE round 3.)
            hi = (pos & j) != 0
            pd = jnp.where(hi, jnp.roll(d, j, axis=1),
                           jnp.roll(d, -j, axis=1))
            pv = jnp.where(hi, jnp.roll(v, j, axis=1),
                           jnp.roll(v, -j, axis=1))
            ppos = pos ^ j
            # strict total order (position tie-break) so the pair's two
            # decisions are complementary even on equal keys
            less = (d < pd) | ((d == pd) & (pos < ppos))
            keep_small = (((pos & ksz) == 0) == ((pos & j) == 0))
            take_self = keep_small == less
            d = jnp.where(take_self, d, pd)
            v = jnp.where(take_self, v, pv)
            j //= 2
        ksz *= 2
    out_d_ref[:] = d[:, :topk].astype(out_d_ref.dtype)
    out_v_ref[:] = v[:, :topk]


@functools.partial(jax.jit,
                   static_argnames=("topk", "block_b", "interpret"))
def sorted_topk(
    d: jnp.ndarray,       # f32[B, n] keys (BIG = padding)
    v: jnp.ndarray,       # int32[B, n] payload
    topk: int,
    block_b: int = 64,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-``topk`` smallest by key, payload carried through.
    Returns (f32[B, topk], int32[B, topk]) sorted ascending."""
    bsz, n0 = d.shape
    n = 1 << (n0 - 1).bit_length()
    if n != n0:
        d = jnp.concatenate(
            [d, jnp.full((bsz, n - n0), BIG, d.dtype)], axis=1)
        v = jnp.concatenate(
            [v, jnp.full((bsz, n - n0), -1, v.dtype)], axis=1)
    pad_b = (-bsz) % block_b
    if pad_b:
        d = jnp.concatenate([d, jnp.full((pad_b, n), BIG, d.dtype)])
        v = jnp.concatenate([v, jnp.full((pad_b, n), -1, v.dtype)])
    nb = d.shape[0] // block_b

    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_b, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, topk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, topk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    od, ov = pl.pallas_call(
        functools.partial(_kernel, n=n, topk=topk),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((d.shape[0], topk), d.dtype),
            jax.ShapeDtypeStruct((d.shape[0], topk), v.dtype),
        ],
        interpret=interpret,
    )(d, v)
    return od[:bsz], ov[:bsz]
