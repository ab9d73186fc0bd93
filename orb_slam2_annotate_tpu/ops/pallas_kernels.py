"""Pallas TPU kernels for the front-end hot ops.

Two kernels back the highest-traffic array programs:

* fast_score_map_pallas — the FAST-9/16 corner score.  The jnp reference
  (ops/fast.py) builds 16 rolled copies + ~300 elementwise ops that XLA
  materializes in HBM between fusions; the kernel streams one padded row
  tile through VMEM and evaluates the whole 16-point ring + both arc
  reductions in-register (one HBM read, one write).
* hamming_pairwise_pallas — bit-packed descriptor distance matrix.  Tiled
  over query rows with the full target set resident in VMEM (N x 8 u32 =
  32 KB), XOR + popcount + word-sum per tile.

Both default OFF (ops/fast.py and ops/hamming.py call them only when
ORBTPU_USE_PALLAS=1) until profiled on hardware; correctness is pinned to
the jnp references by interpret-mode tests (tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import ARC_LEN, CIRCLE

USE_PALLAS = os.environ.get("ORBTPU_USE_PALLAS", "0") == "1"

_TILE_ROWS = 128


def _fast_tile_kernel(img_ref, lo_ref, hi_ref, score_ref, hi_out_ref):
    """img_ref: [TILE+6, W+6] f32 padded tile; outputs [TILE, W]."""
    img = img_ref[:]
    th_lo = lo_ref[0]
    th_hi = hi_ref[0]
    tile_h = score_ref.shape[0]
    w = score_ref.shape[1]

    center = img[3:3 + tile_h, 3:3 + w]
    # ring differences via static sub-slices of the padded tile
    diffs = [
        img[3 + dy:3 + dy + tile_h, 3 + dx:3 + dx + w] - center
        for dy, dx in CIRCLE
    ]

    def arc_strength(ds):
        best = jnp.full(center.shape, -jnp.inf, center.dtype)
        for start in range(16):
            run = ds[start]
            for i in range(1, ARC_LEN):
                run = jnp.minimum(run, ds[(start + i) % 16])
            best = jnp.maximum(best, run)
        return best

    v_bright = arc_strength(diffs)
    v_dark = arc_strength([-d for d in diffs])
    score = jnp.maximum(v_bright, v_dark)
    score_ref[:] = jnp.where(score > th_lo, score, 0.0)
    hi_out_ref[:] = (score > th_hi).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(3,))
def fast_score_map_pallas(img: jnp.ndarray, threshold_lo: float,
                          threshold_hi: float, interpret: bool = False):
    """Drop-in for ops.fast.fast_score_map (same outputs, border-zeroed)."""
    h, w = img.shape
    tile = min(_TILE_ROWS, max(8, h))
    n_tiles = pl.cdiv(h, tile)
    h_pad = n_tiles * tile

    padded = jnp.zeros((h_pad + 6, w + 6), img.dtype)
    padded = padded.at[3:3 + h, 3:3 + w].set(img)

    lo = jnp.asarray([threshold_lo], jnp.float32)
    hi = jnp.asarray([threshold_hi], jnp.float32)

    score, is_hi = pl.pallas_call(
        _fast_tile_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile + 6, w + 6), lambda i: (i, 0),
                         memory_space=pltpu.ANY if False else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h_pad, w), jnp.float32),
            jax.ShapeDtypeStruct((h_pad, w), jnp.int32),
        ],
        interpret=interpret,
    )(padded, lo, hi)

    score = score[:h]
    is_hi = is_hi[:h].astype(bool)
    # zero the 3-px border like the reference implementation
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    score = jnp.where(interior, score, 0.0)
    return score, (is_hi & interior & (score > 0))


def _hamming_tile_kernel(a_ref, b_ref, out_ref):
    """a: [TM, W] u32; b: [N2, W] u32; out: [TM, N2] i32."""
    a = a_ref[:]
    b = b_ref[:]
    x = a[:, None, :] ^ b[None, :, :]
    out_ref[:] = jnp.sum(
        jax.lax.population_count(x).astype(jnp.int32), axis=-1
    )


@functools.partial(jax.jit, static_argnums=(2,))
def hamming_pairwise_pallas(a: jnp.ndarray, b: jnp.ndarray,
                            interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.hamming.hamming_pairwise."""
    n1 = a.shape[0]
    n2 = b.shape[0]
    tm = min(128, n1)
    n_tiles = pl.cdiv(n1, tm)
    n1_pad = n_tiles * tm
    W = a.shape[-1]
    a_pad = jnp.zeros((n1_pad, W), a.dtype).at[:n1].set(a)

    out = pl.pallas_call(
        _hamming_tile_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tm, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, n2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n1_pad, n2), jnp.int32),
        interpret=interpret,
    )(a_pad, b)
    return out[:n1]
