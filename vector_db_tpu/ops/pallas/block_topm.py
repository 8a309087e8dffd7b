"""Fused block top-m scan kernel: phase 1 of the two-phase exact search.

Evolution of :mod:`block_min` (phase 1 of the 3-phase block-select): the
3-phase path's cost is dominated by what happens AFTER the kernel —
selecting top blocks, gathering every row of those blocks from the bf16
mirror (~650 MB/kilobatch at 1M x 768, blocks_k=20), re-scoring them, and
a second selection (EXP_P1.json "stages": p1 31k -> +sel 27k -> +p2 15k
per-call QPS). All of that exists only to turn block-minima into row
candidates.

This kernel emits row candidates directly: for every ``block`` of corpus
rows it writes the ``m`` smallest mirror distances AND their row offsets
within the block. The distance panel still never leaves VMEM; the
epilogue runs m unrolled min/argmin/mask passes in registers. Downstream,
one global ``lax.top_k`` over the [B, N/block * m] emitted estimates
yields the exact-rescore candidate set — no block gather, no mirror
re-score, no second selection.

Candidate-set contract vs the 3-phase path: a true top-k row survives iff
it is among the best ``m`` mirror rows of its own 128-row block AND among
the best ``rows_k`` emitted estimates globally. Blocks are slot-order
(insertion order), uncorrelated with query neighborhoods, so >m of a
query's true top-k landing in one block is the only structural failure
mode — m=4 makes that negligible at 1M scale (measured recall 1.0; see
EXP_2P.json).

Replaces the scoring+selection loop of the reference's exact search
(reference vector_db.py:208-212 / hnsw.py:89-134 semantics at recall 1.0)
as the candidate generator on TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38


def _kernel(q_ref, x_ref, xsq_ref, vals_ref, idx_ref, *, block, m):
    x = x_ref[:]                           # [T, ds] (tab dtype)
    q = q_ref[:]                           # [Bq, ds], pre-scaled by -2
    cross = jnp.dot(x, q.T, preferred_element_type=jnp.float32)  # [T, Bq]
    d = xsq_ref[:][:, None] + cross
    t, bq = d.shape
    nb = t // block
    d = d.reshape(nb, block, bq)
    lane = jax.lax.broadcasted_iota(jnp.int32, (nb, block, bq), 1)
    for j in range(m):
        mv = jnp.min(d, axis=1)                              # [nb, Bq]
        # first-match argmin: smallest lane index attaining the min
        mi = jnp.min(
            jnp.where(d == mv[:, None, :], lane, block), axis=1
        ).astype(jnp.int32)                                  # [nb, Bq]
        vals_ref[j * nb : (j + 1) * nb, :] = mv
        idx_ref[j * nb : (j + 1) * nb, :] = mi
        if j + 1 < m:
            d = jnp.where(lane == mi[:, None, :], _BIG, d)


@functools.partial(jax.jit, static_argnames=("block", "m", "tile", "qtile",
                                             "interpret"))
def block_topm_scan(
    score_q: jnp.ndarray,   # [B, ds] queries in score space (any float)
    tab: jnp.ndarray,       # bf16|f32[N, ds] mirror table
    xsq_eff: jnp.ndarray,   # f32[N] row norms with invalid rows ~2e38
    block: int = 128,
    m: int = 4,
    tile: int = 4096,
    qtile: int = 512,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-block top-``m`` of ``xsq_eff - 2 q·x``.

    Returns ``(vals f32[B, NB*m], rows int32[B, NB*m])`` where
    ``NB = ceil(N / block)`` padded corpus blocks and ``rows`` are GLOBAL
    row indices (may point at padded/invalid rows — those carry vals
    >= 1e37 and must be masked by the caller). Within a block the m
    entries are ascending; across the flat axis entry ``b_i * m + j`` is
    the j-th best of block ``b_i``.

    The ``q_sq`` constant is omitted (rank-invariant per query, exactly
    like the XLA phase 1); the -2 is folded into the query operand. Grid
    and VMEM sizing follow :func:`..block_min.block_min_scan` — the f32
    [tile, qtile] panel is the budget driver and is capped at 8 MB by
    shrinking qtile first, then tile (measured: larger panels compile but
    return garbage, EXP_P1.json tile-8192 rows).
    """
    if interpret is None:  # auto: interpret on CPU test meshes (the TPU
        # relay backend reports platform "axon", so test for cpu, not tpu)
        interpret = jax.default_backend() == "cpu"

    def _budget(t, qt):
        return t * qt * 4 + t * score_q.shape[1] * tab.dtype.itemsize * 2

    while _budget(tile, qtile) > 12 << 20 and qtile > 128:
        qtile //= 2
    while _budget(tile, qtile) > 12 << 20 and tile > 1024:
        tile //= 2
    b, ds = score_q.shape
    n = tab.shape[0]
    pad_n = (-n) % tile
    if pad_n:
        tab = jnp.concatenate([tab, jnp.zeros((pad_n, ds), tab.dtype)])
        xsq_eff = jnp.concatenate(
            [xsq_eff, jnp.full((pad_n,), 2.0e38, xsq_eff.dtype)])
    pad_b = (-b) % qtile
    q = (score_q * -2.0).astype(tab.dtype)
    if pad_b:
        q = jnp.concatenate([q, jnp.zeros((pad_b, ds), q.dtype)])
    n_pad, b_pad = tab.shape[0], q.shape[0]
    assert tile % block == 0
    nb_tile = tile // block
    nb_total = n_pad // block
    grid = (b_pad // qtile, n_pad // tile)

    vals, idx = pl.pallas_call(
        functools.partial(_kernel, block=block, m=m),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((qtile, ds), lambda qi, ti: (qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, ds), lambda qi, ti: (ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile,), lambda qi, ti: (ti,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nb_tile * m, qtile), lambda qi, ti: (ti, qi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb_tile * m, qtile), lambda qi, ti: (ti, qi),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nb_total * m, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((nb_total * m, b_pad), jnp.int32),
        ],
        interpret=interpret,
    )(q, tab, xsq_eff)

    # kernel layout: per corpus tile ti, rows [ti*nb_tile*m : (ti+1)*...)
    # hold (pass j, block bi within tile) at offset j*nb_tile + bi.
    # -> [n_tiles, m, nb_tile, B] -> [B, n_tiles, nb_tile, m] flat.
    n_tiles = n_pad // tile
    vals = vals.reshape(n_tiles, m, nb_tile, b_pad)
    idx = idx.reshape(n_tiles, m, nb_tile, b_pad)
    vals = jnp.transpose(vals, (3, 0, 2, 1)).reshape(b_pad, nb_total * m)
    idx = jnp.transpose(idx, (3, 0, 2, 1)).reshape(b_pad, nb_total * m)
    # local lane -> global row id: block index is the flat position // m
    gblock = (jnp.arange(nb_total * m, dtype=jnp.int32) // m) * block
    rows = idx + gblock[None, :]
    return vals[:b], rows[:b]
