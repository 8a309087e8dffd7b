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
    tile: int = 8192,
    qtile: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Per-block minima of ``xsq_eff - 2 q·x``: f32[B, N // block].

    The ``q_sq`` constant is omitted (rank-invariant per query, exactly
    like the XLA phase 1); the -2 is folded into the query operand (an
    exact power-of-two scale) so the kernel epilogue is one add + min.
    ``B`` is padded to a ``qtile`` multiple and ``N`` to a ``tile``
    multiple internally.

    Grid-step sizing is the whole game (measured 1M x 768, B=1000,
    proj-128 mirror): the round-3 defaults (tile=2048, qtile=256) ran
    2048 steps of ~17 us fixed overhead each — 36 ms for a 1.3 ms
    roofline. One query tile of 1024 x a corpus tile of 8192 streams the
    mirror ONCE per batch in ~128 steps. VMEM at (8192, 1024, ds=128)
    bf16: x 2 MB (x2 pipelined) + q 256 KB + out 256 KB ~ 4.8 MB.
    """
    if interpret is None:  # auto: interpret on CPU test meshes (the TPU
        # relay backend reports platform "axon", so test for cpu, not tpu)
        interpret = jax.default_backend() == "cpu"
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
