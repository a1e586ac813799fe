"""Pallas TPU kernel: fused sub-pixel MAP disparity estimation.

Single-pass fusion of the estimator (``ops/subpixel.py``): per pixel, argmax
over the disparity lanes, masked exp-weighting of the ±window, and the
normalized expectation — one VMEM-resident pass over pixel tiles instead of
XLA's separate argmax / max / exp / two-sum reductions over the full
[B, H, W, D] similarity tensor.

Grid: flattened pixel tiles of ``TILE`` rows; the disparity axis (<= 128 for
the PDS similarity step of 2) lives entirely in lanes. The kernel computes
with the same masked-softmax formulation as the XLA path, so results are
bit-comparable (pinned by tests, including interpret mode on CPU).

Use :func:`subpixel_map_pallas` as a drop-in replacement for
``ops.subpixel.subpixel_map`` on TPU; it falls back to the XLA
implementation on other platforms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from practicaldeepstereo_nips2018_tpu.ops import subpixel as subpixel_xla

# 1024 matches XLA's 1-D f32 layout tiling T(1024): the flat disparity
# output must block on that granularity or Mosaic rejects the layout.
_TILE_ROWS = 1024


def _estimator_kernel(similarities_ref, disparity_ref, *, half_taps: int,
                      disparity_step: int):
    scores = similarities_ref[:].astype(jnp.float32)  # [TILE, D]
    rows, number_of_disparities = scores.shape

    index = jax.lax.broadcasted_iota(jnp.int32, (rows, number_of_disparities),
                                     1)
    maximum = jnp.max(scores, axis=-1, keepdims=True)
    # argmax as min-index-where-maximal (same first-occurrence tie semantics
    # as ``jnp.argmax``): Mosaic's native lane-axis argmax lowering returns
    # wrong indices on this toolchain (measured), min/max/sum reductions are
    # correct.
    best = jnp.min(
        jnp.where(scores == maximum, index, number_of_disparities),
        axis=-1, keepdims=True)
    in_window = jnp.abs(index - best) <= half_taps

    weights = jnp.where(in_window, jnp.exp(scores - maximum), 0.0)
    disparities = (disparity_step * index).astype(jnp.float32)
    expectation = (jnp.sum(weights * disparities, axis=-1) /
                   jnp.sum(weights, axis=-1))
    disparity_ref[:] = expectation.reshape(disparity_ref.shape)


def subpixel_map_pallas(similarities: jnp.ndarray,
                        half_support_window: int = 4,
                        disparity_step: int = 2,
                        interpret: bool = False) -> jnp.ndarray:
    """Fused Pallas sub-pixel MAP estimator.

    Args:
        similarities: [..., D] similarity scores, disparity last.
        half_support_window, disparity_step: as in
            ``ops.subpixel.subpixel_map``.
        interpret: run the kernel in interpreter mode (CPU testing).

    Returns:
        [...] float32 disparities.
    """
    if disparity_step < 1 or half_support_window < 1 or (
            half_support_window % disparity_step != 0):
        raise ValueError("invalid window/step configuration")
    if not interpret and jax.devices()[0].platform not in ("tpu",):
        # XLA fallback in float32 — identical numerics to the kernel, which
        # casts each tile to float32 on load.
        return subpixel_xla.subpixel_map(
            similarities.astype(jnp.float32), half_support_window,
            disparity_step)

    *leading, number_of_disparities = similarities.shape
    pixels = 1
    for size in leading:
        pixels *= size
    flat = similarities.reshape(pixels, number_of_disparities)

    # Pad the pixel count to a whole number of tiles (extra rows are junk
    # but harmless — the center tap is always valid so no NaNs).
    tiles = -(-pixels // _TILE_ROWS)
    padded_pixels = tiles * _TILE_ROWS
    # Pad the disparity axis up to full 128-lane tiles with -inf: Mosaic's
    # lane-axis reductions over an unaligned minor dim (e.g. 96) read the
    # padding lanes (measured wrong argmax/sum on TPU); -inf taps lose every
    # argmax/max and contribute exp(-inf)=0 weight, exactly the reference's
    # out-of-range-tap semantics (reference ``estimator.py:71-77``).
    padded_disparities = -(-number_of_disparities // 128) * 128
    pad_width = [(0, padded_pixels - pixels),
                 (0, padded_disparities - number_of_disparities)]
    if padded_pixels != pixels or padded_disparities != number_of_disparities:
        flat = jnp.pad(flat, pad_width, constant_values=-jnp.inf)

    kernel = functools.partial(
        _estimator_kernel,
        half_taps=half_support_window // disparity_step,
        disparity_step=disparity_step)
    disparity = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[pl.BlockSpec((_TILE_ROWS, padded_disparities),
                               lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        # (8, 128)-tiled 2-D output blocks: pixel p lives at row p // 128,
        # lane p % 128 (1-D or (1, TILE) blocks violate Mosaic's layout
        # rules for the output operand).
        out_specs=pl.BlockSpec((_TILE_ROWS // 128, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded_pixels // 128, 128),
                                       jnp.float32),
        interpret=interpret,
    )(flat)
    return disparity.reshape(padded_pixels)[:pixels].reshape(leading)
