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

_TILE_ROWS = 512


def _estimator_kernel(similarities_ref, disparity_ref, *, half_taps: int,
                      disparity_step: int):
    scores = similarities_ref[:].astype(jnp.float32)  # [TILE, D]
    rows, number_of_disparities = scores.shape

    best = jnp.argmax(scores, axis=-1)[:, None]  # [TILE, 1]
    index = jax.lax.broadcasted_iota(jnp.int32, (rows, number_of_disparities),
                                     1)
    in_window = jnp.abs(index - best) <= half_taps

    maximum = jnp.max(scores, axis=-1, keepdims=True)
    weights = jnp.where(in_window, jnp.exp(scores - maximum), 0.0)
    disparities = (disparity_step * index).astype(jnp.float32)
    expectation = (jnp.sum(weights * disparities, axis=-1) /
                   jnp.sum(weights, axis=-1))
    disparity_ref[0, :] = expectation


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
        return subpixel_xla.subpixel_map(
            similarities, half_support_window, disparity_step)

    *leading, number_of_disparities = similarities.shape
    pixels = 1
    for size in leading:
        pixels *= size
    flat = similarities.reshape(pixels, number_of_disparities)

    # Pad the pixel count to a whole number of tiles (extra rows are junk
    # but harmless — the center tap is always valid so no NaNs).
    tiles = -(-pixels // _TILE_ROWS)
    padded_pixels = tiles * _TILE_ROWS
    if padded_pixels != pixels:
        flat = jnp.pad(flat, [(0, padded_pixels - pixels), (0, 0)])

    kernel = functools.partial(
        _estimator_kernel,
        half_taps=half_support_window // disparity_step,
        disparity_step=disparity_step)
    disparity = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[pl.BlockSpec((_TILE_ROWS, number_of_disparities),
                               lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _TILE_ROWS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles, _TILE_ROWS), jnp.float32),
        interpret=interpret,
    )(flat)
    return disparity.reshape(padded_pixels)[:pixels].reshape(leading)
