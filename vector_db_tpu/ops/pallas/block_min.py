"""Fused block-min scan kernel: phase 1 of the block-select search.

The XLA phase 1 (ops/exact.py block_select_search*) materializes a
[B, tile] f32 distance panel in HBM per corpus tile before reducing it
to per-block minima — measured at 1M x 768 that roundtrip (plus the
mask/reshape copies around it) costs ~8x the scoring matmul itself and
dominates the recall-1.0 scan. Here the panel never leaves VMEM: each
grid cell does one MXU contraction [T, ds] x [ds, Bq] and reduces it to
[T/block, Bq] minima in registers, so HBM traffic is one streaming read
of the mirror table per query tile plus the (tiny) minima output.

The distance panel is computed TRANSPOSED ([rows, queries]) so the
output block ([T/block, Bq]) keeps both trailing dims (8, 128)-aligned —
a [Bq, T/block] block with T/block = 16 is not a legal Mosaic tiling.

Masking: callers fold validity into ``xsq_eff`` (invalid rows set to
~2e38) — the kernel stays pure arithmetic and a fully-invalid block's
minimum still exceeds any threshold used downstream.

Replaces the scoring loop of the reference's exact search
(reference vector_db.py:208-212) as the phase-1 selector on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, x_ref, xsq_ref, out_ref, *, block):
    x = x_ref[:]                           # [T, ds] (tab dtype)
    q = q_ref[:]                           # [Bq, ds], pre-scaled by -2
    cross = jnp.dot(x, q.T, preferred_element_type=jnp.float32)  # [T, Bq]
    d = xsq_ref[:][:, None] + cross
    t, bq = d.shape
    out_ref[:] = jnp.min(d.reshape(t // block, block, bq), axis=1)


@functools.partial(jax.jit, static_argnames=("block", "tile", "qtile",
                                             "interpret"))
def block_min_scan(
    score_q: jnp.ndarray,   # [B, ds] queries in score space (any float)
    tab: jnp.ndarray,       # bf16|f32[N, ds] mirror table, N % tile == 0
    xsq_eff: jnp.ndarray,   # f32[N] row norms with invalid rows ~2e38
    block: int = 128,
    tile: int = 4096,
    qtile: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Per-block minima of ``xsq_eff - 2 q·x``: f32[B, N // block].

    The ``q_sq`` constant is omitted (rank-invariant per query, exactly
    like the XLA phase 1); the -2 is folded into the query operand (an
    exact power-of-two scale) so the kernel epilogue is one add + min.
    ``B`` is padded to a ``qtile`` multiple and ``N`` to a ``tile``
    multiple internally.

    Grid-step sizing is the whole game (measured 1M x 768, B=1000,
    proj-128 mirror, EXP_P1.json): the round-3 defaults (tile=2048,
    qtile=256) ran 2048 steps of ~17 us fixed overhead each — 36 ms for
    a ~1.3 ms roofline. (4096, 512) measured fastest (29.8k two-dispatch
    QPS vs 24.1k at the old defaults).

    VMEM envelope — the hard constraint: the kernel's [tile, qtile] f32
    distance panel lives in VMEM next to the double-buffered inputs, and
    at tile*qtile*4 = 16 MB (e.g. 8192 x 512) Mosaic compiles but the
    output comes back garbage (measured: every sampled min lands at the
    BIG mask). Guard: the panel is capped at 8 MB by shrinking qtile
    first (more query tiles = more mirror re-reads, but correct), then
    tile.
    """
    if interpret is None:  # auto: interpret on CPU test meshes (the TPU
        # relay backend reports platform "axon", so test for cpu, not tpu)
        interpret = jax.default_backend() == "cpu"
    # VMEM guard: the f32 panel (tile*qtile*4) plus the double-buffered
    # table tile (tile*ds*itemsize*2) must fit; cap their sum at ~12 MB
    # (measured: ds=128 panels over 8 MB return garbage; the ds=768
    # bf16 mirror at tile 4096 crashes the remote compile helper)
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
    grid = (b_pad // qtile, n_pad // tile)

    out = pl.pallas_call(
        functools.partial(_kernel, block=block),
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
            out_specs=pl.BlockSpec(
                (tile // block, qtile), lambda qi, ti: (ti, qi),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_pad // block, b_pad), jnp.float32),
        interpret=interpret,
    )(q, tab, xsq_eff)
    return out.T[:b]
