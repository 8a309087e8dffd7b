"""Fused ADC scoring kernel for the IVF-PQ probe path.

The probe path gathers ``n_probe`` cell-contiguous code blocks per query
(``[B, P, m]`` candidates) and scores them against per-query LUTs. The
XLA one-hot formulation materializes a ``[P, m*ksub]`` transient in HBM
per query (~0.5 GB of write+read traffic at 1M, n_probe=16 — the measured
bound of the 766-QPS probe mode, see index/ivf.py:_ivf_pq_probe_cells).

Here the one-hot never exists in HBM: per (query, candidate-tile) grid
step the kernel builds a ``[ksub, tile]`` one-hot slab in VMEM *per
subspace group* and contracts it with the matching LUT slice on the MXU,
accumulating ``m`` rank-1 matvecs. Group-wise construction does
``m * ksub * tile`` compares per tile — m× fewer VPU ops than the
flattened ``[tile, m*ksub]`` compare the full-scan kernel
(ops/pallas/adc_scan.py) uses. Output is just the ``[B, P]`` distance
panel (8 MB per 64-query block — trivial); selection and exact rerank
stay in XLA where ``top_k`` is already fast.

Replaces the LUT-gather loop of the reference's ADC scoring
(reference pq.py:77-108) for probed candidates on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.0e38


def _kernel(lut_ref, codes_ref, corr_ref, valid_ref, out_ref, *, tile,
            ksub):
    codes = codes_ref[0]                     # int32[m, T]
    m = codes.shape[0]
    # hi/lo bf16 LUT pair: MXU multiplies truncate f32 operands to bf16
    # (accumulation type is separate); the one-hot operand is exact 0/1,
    # so two contractions reproduce the f32 LUT sum to ~2^-16. A single
    # bf16 LUT measurably cost 6 recall points at the fetch boundary
    # (round-2 BENCH_SIFT, 0.824 vs 0.885 at n_probe=16).
    lut = lut_ref[0]                         # f32[1, m*ksub]
    lut_hi = lut.astype(jnp.bfloat16)
    lut_lo = (lut - lut_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jnp.zeros((1, tile), jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (ksub, tile), 0)
    for j in range(m):
        oh = (rows == codes[j, :][None, :]).astype(jnp.bfloat16)
        sl = slice(j * ksub, (j + 1) * ksub)
        acc = acc + jnp.dot(lut_hi[:, sl], oh,
                            preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(lut_lo[:, sl], oh,
                            preferred_element_type=jnp.float32)
    d = acc + corr_ref[0]
    out_ref[0] = jnp.where(valid_ref[0] != 0, d, BIG)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def adc_probe_scores(
    lut: jnp.ndarray,     # f32[B, m, ksub] per-query subspace distances
    codes: jnp.ndarray,   # int32[B, m, P] gathered candidate codes (T'd)
    corr: jnp.ndarray,    # f32[B, P] additive correction (residual terms)
    valid: jnp.ndarray,   # bool[B, P]
    tile: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """ADC distances for per-query gathered candidates: f32[B, P],
    invalid candidates at BIG. ``P`` is padded to a ``tile`` multiple
    internally; callers keep their own P."""
    b, m, ksub = lut.shape
    p = codes.shape[2]
    pad = (-p) % tile
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.zeros((b, m, pad), codes.dtype)], axis=2)
        corr = jnp.concatenate(
            [corr, jnp.zeros((b, pad), corr.dtype)], axis=1)
        valid = jnp.concatenate(
            [valid, jnp.zeros((b, pad), bool)], axis=1)
    n_tiles = codes.shape[2] // tile
    # Singleton middle axis on the per-query 2-D operands: Mosaic
    # requires the last two block dims divisible by (8, 128) or equal to
    # the array dims, so a (1, X) block over (B, X) is illegal while a
    # (1, 1, X) block over (B, 1, X) is exact-match legal.
    lut_flat = lut.reshape(b, 1, m * ksub)
    corr3 = corr[:, None, :]
    valid_i = valid.astype(jnp.int32)[:, None, :]

    grid_spec = pl.GridSpec(
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, m * ksub), lambda q, t: (q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, tile), lambda q, t: (q, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda q, t: (q, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda q, t: (q, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile), lambda q, t: (q, 0, t),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, tile=tile, ksub=ksub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, 1, codes.shape[2]), jnp.float32),
        interpret=interpret,
    )(lut_flat, codes, corr3, valid_i)
    return out[:, 0, :p]
