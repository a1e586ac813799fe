"""Disparity error metrics: mean absolute error and n-pixels error.

Re-implements the reference's ``errors.py``:

* :func:`absolute_error` — pixel-wise |est - gt| and its mean (or median)
  over pixels with known ground truth; unknown pixels (gt == inf) show as 0 in
  the pixel-wise map and are excluded from the average; all-unknown returns
  0.0 (reference ``errors.py:9-40``).
* :func:`n_pixels_error` — pixel-wise indicator of |est - gt| > n and the
  percentage of such pixels among those with ground truth; same masking and
  empty-case semantics (reference ``errors.py:43-74``).

Both are jit-safe pure functions (no data-dependent shapes): the empty-ground-
truth case is handled with a ``where`` on the valid-pixel count rather than a
Python branch, so the metrics can run fused on-device inside the eval step.
"""

from __future__ import annotations

import jax.numpy as jnp


def _valid_mask(ground_truth_disparity: jnp.ndarray) -> jnp.ndarray:
    return ~jnp.isinf(ground_truth_disparity)


def absolute_error(estimated_disparity: jnp.ndarray,
                   ground_truth_disparity: jnp.ndarray,
                   use_mean: bool = True):
    """Returns (pixelwise_absolute_error, average_absolute_error).

    Args:
        estimated_disparity: ``[...]`` estimated disparities.
        ground_truth_disparity: ``[...]`` ground truth, unknown -> ``inf``.
        use_mean: average with the mean if True, else the median
            (reference ``errors.py:22-24``).
    """
    valid = _valid_mask(ground_truth_disparity)
    difference = jnp.abs(estimated_disparity - ground_truth_disparity)
    pixelwise = jnp.where(valid, difference, 0.0)
    number_valid = jnp.sum(valid)
    if use_mean:
        average = jnp.where(
            number_valid > 0,
            jnp.sum(pixelwise) / jnp.maximum(number_valid, 1), 0.0)
    else:
        masked = jnp.where(valid, difference, jnp.nan)
        median = jnp.nanmedian(masked)
        average = jnp.where(number_valid > 0, median, 0.0)
    return pixelwise, average


def n_pixels_error(estimated_disparity: jnp.ndarray,
                   ground_truth_disparity: jnp.ndarray,
                   n: float = 3.0):
    """Returns (pixelwise_n_pixels_error, percentage_of_pixels_with_error).

    The n-pixels error is 1 where ``|est - gt| > n`` (strictly greater,
    reference ``errors.py:53-54``) and 0 elsewhere; the scalar is the
    percentage (x100) of erroneous pixels among those with ground truth.
    """
    valid = _valid_mask(ground_truth_disparity)
    difference = jnp.abs(estimated_disparity - ground_truth_disparity)
    over_threshold = (difference > n).astype(estimated_disparity.dtype)
    pixelwise = jnp.where(valid, over_threshold, 0.0)
    number_valid = jnp.sum(valid)
    percentage = jnp.where(
        number_valid > 0,
        100.0 * jnp.sum(pixelwise) / jnp.maximum(number_valid, 1), 0.0)
    return pixelwise, percentage
