"""Fused exact-search kernel: L2 distances + running top-k in one pass.

The XLA path (ops.exact.exact_search_tiled) materializes a [B, tile]
distance block and runs a full ``lax.top_k`` (sort) per tile. This Pallas
kernel fuses the whole thing: corpus tiles stream HBM->VMEM through the
pallas pipeline (automatic double buffering), the distance block is an MXU
matmul in VMEM, and the top-k state ([B, k] distances + indices) lives in a
revisited output block across grid steps — k is selected by iterative
min-extraction (k reductions on the VPU), never a sort, and the [B, N]
distance matrix never exists.

Grid: one program per corpus tile, sequential. Output blocks use a constant
index map, so they stay resident in VMEM as accumulators (standard Pallas
revisiting pattern).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.0e38  # python float: jnp constants captured by kernels are rejected


def _kernel(q_ref, x_ref, xsq_ref, valid_ref, topd_ref, topi_ref, *, k, tile):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        topd_ref[:] = jnp.full_like(topd_ref[:], BIG)
        topi_ref[:] = jnp.full_like(topi_ref[:], -1)

    q = q_ref[:]                      # [B, dim]
    x = x_ref[:]                      # [T, dim]
    cross = jnp.dot(q, x.T, preferred_element_type=jnp.float32)  # [B, T]
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)                 # [B, 1]
    d = q_sq - 2.0 * cross + xsq_ref[:][None, :]
    d = jnp.maximum(d, 0.0)
    d = jnp.where(valid_ref[:][None, :] != 0, d, BIG)

    b = d.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, topd_ref.shape, 1)

    topd = topd_ref[:]
    topi = topi_ref[:]
    for _ in range(k):
        m = jnp.min(d, axis=1)                      # [B]
        am = jnp.argmin(d, axis=1).astype(jnp.int32)
        # drop the extracted column from this tile's pool
        d = jnp.where(col == am[:, None], BIG, d)
        # replace each row's current worst if the extracted min beats it
        worst = jnp.max(topd, axis=1)               # [B]
        aw = jnp.argmax(topd, axis=1).astype(jnp.int32)
        better = (m < worst)[:, None]
        hit = (kcol == aw[:, None]) & better
        gidx = t * tile + am
        topd = jnp.where(hit, m[:, None], topd)
        topi = jnp.where(hit, gidx[:, None], topi)
    topd_ref[:] = topd
    topi_ref[:] = topi


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def l2_topk(
    queries: jnp.ndarray,   # f32[B, dim]
    emb: jnp.ndarray,       # f32[N, dim]
    valid: jnp.ndarray,     # bool[N]
    k: int,
    tile: int = 2048,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k smallest squared-L2. Returns (f32[B, k], int32[B, k]),
    sorted ascending, (BIG, -1) padded when fewer than k valid rows."""
    b, dim = queries.shape
    n = emb.shape[0]
    pad = (-n) % tile
    if pad:
        emb = jnp.concatenate([emb, jnp.zeros((pad, dim), emb.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    n_pad = emb.shape[0]
    x_sq = jnp.sum(emb * emb, axis=1)
    valid_i = valid.astype(jnp.int32)
    n_tiles = n_pad // tile

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, dim), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, dim), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda t: (t,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
    )
    topd, topi = pl.pallas_call(
        functools.partial(_kernel, k=k, tile=tile),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        interpret=interpret,
    )(queries, emb, x_sq, valid_i)

    order = jnp.argsort(topd, axis=1)
    topd = jnp.take_along_axis(topd, order, axis=1)
    topi = jnp.take_along_axis(topi, order, axis=1)
    topi = jnp.where(topd >= BIG, -1, topi)
    return topd, topi
