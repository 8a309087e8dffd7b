"""Fused pool-merge kernel: bitonic sort-by-key with an int32 payload.

An EXACT top-P merge with the payload riding the exchanges — no HBM
round trips, no separate permutation pass. Shipped as an exactness
OPTION (``wide_search(merge_kernel=True)``), NOT the perf default:
honest on-chip timing (round 3, after fixing lazy-sync micros) measures
the full network at ~1.15 s per [1024, 16384] merge vs ~0.05 s for the
``approx_min_k`` hardware partial-reduce it would replace — a bitonic
network's ~log²(n)/2 vectorized stages on the VPU cannot beat the MXU-
adjacent PartialReduce hardware. Use it when the pool merge must be
exact (the partial reduce is approximate); use the default elsewhere.

Two entry shapes:

- ``presorted=0``: full bitonic sort, ~log²(n)/2 stages.
- ``presorted=p``: the first ``p`` columns are already ascending (the
  steady-state wide-beam pool — this kernel's own output from the
  previous step). Only the candidate suffix gets a (descending) sort at
  its own pow2 width, and one ascending bitonic-merge pass over the
  full width finishes: for P=1280/K=3584 that is ~52 full-width stage
  equivalents instead of 91 (1.75× fewer). Layout inside the kernel is
  ``asc-prefix ++ BIG plateau ++ desc-suffix`` — non-decreasing then
  non-increasing, i.e. bitonic, so the single merge pass is exact.

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


def _exchange(d, v, pos, j, keep_small):
    """One compare-exchange stage at distance ``j``.

    partner = pos ^ j via two static lane rotates: lanes with bit j
    clear read pos+j (roll left), the rest pos-j (roll right). pos^j
    never leaves [0, n), so the circular wrap-around lanes are exactly
    the ones the select drops. (A reshape-to-(…, 2, j) pair swap is an
    unsupported Mosaic shape cast for small j — MICRO_MERGE round 3.)
    """
    hi = (pos & j) != 0
    pd = jnp.where(hi, jnp.roll(d, j, axis=1), jnp.roll(d, -j, axis=1))
    pv = jnp.where(hi, jnp.roll(v, j, axis=1), jnp.roll(v, -j, axis=1))
    ppos = pos ^ j
    # strict total order (position tie-break) so the pair's two
    # decisions are complementary even on equal keys
    less = (d < pd) | ((d == pd) & (pos < ppos))
    take_self = keep_small == less
    return jnp.where(take_self, d, pd), jnp.where(take_self, v, pv)


def _full_sort(d, v, descending=False):
    """Bitonic sort of every row; width must be a power of two."""
    b, w = d.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
    ksz = 2
    while ksz <= w:
        j = ksz // 2
        while j >= 1:
            ks = ((pos & ksz) == 0) == ((pos & j) == 0)
            if descending:
                ks = ~ks
            d, v = _exchange(d, v, pos, j, ks)
            j //= 2
        ksz *= 2
    return d, v


def _kernel(d_ref, v_ref, out_d_ref, out_v_ref, *, n, topk):
    # Keys are compared in f32 regardless of input dtype: f32 and the
    # i32 payload share the native (8, 128) tiling, so the exchange
    # masks keep one layout. With bf16 keys the masks straddle the
    # packed (16, 128) bf16 tiling and the (8, 128) i32 tiling, which
    # Mosaic rejects ("Invalid relayout … replicated in destination",
    # BENCH_PALLAS round 3). bf16→f32 is exact, so compares are too.
    d = d_ref[:].astype(jnp.float32)   # f32[Bb, n]
    v = v_ref[:]                       # i32[Bb, n]
    d, v = _full_sort(d, v)
    out_d_ref[:] = d[:, :topk].astype(out_d_ref.dtype)
    out_v_ref[:] = v[:, :topk]


def _kernel_slice_sort(d_ref, v_ref, od_ref, ov_ref, *, w):
    """Bitonic-sort one ``w``-wide slice per grid cell; slice parity
    (``program_id(1)``) picks ascending (even) or descending (odd), so
    every adjacent slice pair comes out asc++desc = bitonic."""
    d = d_ref[:].astype(jnp.float32)
    v = v_ref[:]
    b = d.shape[0]
    desc = (pl.program_id(1) & 1) == 1
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
    ksz = 2
    while ksz <= w:
        j = ksz // 2
        while j >= 1:
            ks = ((pos & ksz) == 0) == ((pos & j) == 0)
            d, v = _exchange(d, v, pos, j, jnp.logical_xor(ks, desc))
            j //= 2
        ksz *= 2
    od_ref[:] = d
    ov_ref[:] = v


def _kernel_merge_pair(d_ref, v_ref, od_ref, ov_ref, *, w):
    """Merge one asc++desc slice pair (a contiguous ``2w`` block) down to
    its ``w`` smallest, sorted (direction again by grid parity so pairs
    chain across rounds). The pair is bitonic, so the elementwise min of
    its halves IS the lower half of the first merge exchange, and
    log2(w) stages finish the sort."""
    d = d_ref[:].astype(jnp.float32)
    v = v_ref[:]
    b = d.shape[0]
    a_d, b_d = d[:, :w], d[:, w:]
    a_v, b_v = v[:, :w], v[:, w:]
    take_a = a_d <= b_d
    dm = jnp.where(take_a, a_d, b_d)
    vm = jnp.where(take_a, a_v, b_v)
    desc = (pl.program_id(1) & 1) == 1
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
    j = w // 2
    while j >= 1:
        ks = (pos & j) == 0
        dm, vm = _exchange(dm, vm, pos, j, jnp.logical_xor(ks, desc))
        j //= 2
    od_ref[:] = dm
    ov_ref[:] = vm


def _blocked_topk(d, v, topk, w, block_b, interpret):
    """Blocked bitonic top-``topk`` as a chain of small 2-D pallas
    calls: slice-sort (grid over slices), then log2(S) merge-halve
    rounds. Every kernel works on (block_b, <=2w) tiles — no 3-D
    relayouts (a (B, S, w) layout with S < 8 sublanes sent Mosaic into
    minutes-long compiles and 22M scoped-VMEM stacks), and the
    intermediate rounds stream through HBM (~2n·8B per row total, ~1 ms
    at the 1M wide-beam shape)."""
    bsz, n = d.shape
    s = n // w

    def call(kern, din, vin, width_in, width_out, grid_s):
        grid_spec = pl.GridSpec(
            grid=(din.shape[0] // block_b, grid_s),
            in_specs=[
                pl.BlockSpec((block_b, width_in), lambda i, si: (i, si),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, width_in), lambda i, si: (i, si),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((block_b, width_out), lambda i, si: (i, si),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, width_out), lambda i, si: (i, si),
                             memory_space=pltpu.VMEM),
            ],
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((din.shape[0], width_out * grid_s),
                                     jnp.float32),
                jax.ShapeDtypeStruct((din.shape[0], width_out * grid_s),
                                     jnp.int32),
            ],
            interpret=interpret,
        )(din, vin)

    d, v = call(functools.partial(_kernel_slice_sort, w=w), d, v, w, w, s)
    while s > 1:
        s //= 2
        d, v = call(functools.partial(_kernel_merge_pair, w=w),
                    d, v, 2 * w, w, s)
    return d[:, :topk], v[:, :topk]


def _kernel_merge(d_ref, v_ref, out_d_ref, out_v_ref, *, n, topk, k2):
    """Presorted path: cols [0, n-k2) arrive non-decreasing (pool +
    BIG plateau); only the k2-wide suffix needs sorting. Descending-
    sort the suffix, then one ascending bitonic-merge pass over the
    bitonic whole."""
    d = d_ref[:].astype(jnp.float32)
    v = v_ref[:]
    b = d.shape[0]
    dk, vk = _full_sort(d[:, n - k2:], v[:, n - k2:], descending=True)
    d = jnp.concatenate([d[:, : n - k2], dk], axis=1)
    v = jnp.concatenate([v[:, : n - k2], vk], axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    j = n // 2
    while j >= 1:
        d, v = _exchange(d, v, pos, j, (pos & j) == 0)
        j //= 2
    out_d_ref[:] = d[:, :topk].astype(out_d_ref.dtype)
    out_v_ref[:] = v[:, :topk]


def _pow2(x: int) -> int:
    return 1 << max(0, x - 1).bit_length()


@functools.partial(
    jax.jit, static_argnames=("topk", "block_b", "interpret", "presorted"))
def sorted_topk(
    d: jnp.ndarray,       # f32/bf16[B, n] keys (BIG = padding)
    v: jnp.ndarray,       # int32[B, n] payload
    topk: int,
    block_b: int = 64,
    interpret: bool = False,
    presorted: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-``topk`` smallest by key, payload carried through.
    Returns (f32[B, topk], int32[B, topk]) sorted ascending.

    ``presorted=p``: promise that ``d[:, :p]`` is non-decreasing per
    row (e.g. this kernel's own previous output); the kernel then skips
    re-sorting it — ~1.75× fewer stages at the wide-beam shape.
    """
    bsz, n0 = d.shape
    if presorted >= n0:
        presorted = 0  # nothing unsorted to merge; fall through
    if presorted > 0:
        p0 = presorted
        k0 = n0 - p0
        p2 = _pow2(p0)
        k2 = _pow2(k0)
        n = _pow2(p2 + k2)
        # asc prefix (BIG-padded at its end, still non-decreasing) ++
        # BIG plateau ++ unsorted suffix (its BIG pads sink to the
        # suffix's front under the descending sort)
        d = jnp.concatenate(
            [d[:, :p0],
             jnp.full((bsz, n - p0 - k0), BIG, d.dtype),
             d[:, p0:]], axis=1)
        v = jnp.concatenate(
            [v[:, :p0],
             jnp.full((bsz, n - p0 - k0), -1, v.dtype),
             v[:, p0:]], axis=1)
        # the desc sub-sort runs at pow2 width k2: the (k2-k0) plateau
        # BIGs it swallows sort to the descending segment's front
        kern = functools.partial(_kernel_merge, n=n, topk=topk, k2=k2)
    else:
        n = _pow2(n0)
        w = max(2048, _pow2(topk))
        if n > 4096 and w * 2 <= n:
            # blocked network: pad to a w multiple (power-of-two slice
            # count), sort slices, merge-halve
            n = w * _pow2((n0 + w - 1) // w)
        if n != n0:
            d = jnp.concatenate(
                [d, jnp.full((bsz, n - n0), BIG, d.dtype)], axis=1)
            v = jnp.concatenate(
                [v, jnp.full((bsz, n - n0), -1, v.dtype)], axis=1)
        if n > 4096 and w * 2 <= n:
            # blocked multi-call path: per-kernel width <= 2w, so the
            # row-block budget is independent of n
            bb = min(block_b, max(8, (32 * 8192) // (2 * w)))
            bb = 1 << (bb.bit_length() - 1)
            pad_b = (-bsz) % bb
            if pad_b:
                d = jnp.concatenate(
                    [d, jnp.full((pad_b, n), BIG, d.dtype)])
                v = jnp.concatenate(
                    [v, jnp.full((pad_b, n), -1, v.dtype)])
            od, ov = _blocked_topk(d, v, topk, w, bb, interpret)
            return od[:bsz].astype(d.dtype), ov[:bsz]
        kern = functools.partial(_kernel, n=n, topk=topk)
    # scoped-VMEM envelope: the bitonic stages keep ~11 row-block-sized
    # f32/i32 temporaries live, so block_b*n elements is the budget knob.
    # Measured on v5e (BENCH_PALLAS/MICRO_MERGE round 3): 32x8192 fits
    # (~11.5M of the 16M scoped limit), 64x8192 does not (22.9M). Scale
    # block_b down as n grows so wide-beam shapes (n up to 16384) compile.
    max_rows = max(8, (32 * 8192) // n)
    block_b = min(block_b, 1 << (max_rows.bit_length() - 1))
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
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((d.shape[0], topk), d.dtype),
            jax.ShapeDtypeStruct((d.shape[0], topk), v.dtype),
        ],
        interpret=interpret,
    )(d, v)
    return od[:bsz], ov[:bsz]
