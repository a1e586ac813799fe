"""Sub-pixel MAP disparity estimator.

Re-implements the reference's inference-only ``SubpixelMap`` estimator
(reference ``estimator.py:10-91``): at each pixel, take the disparity index
with maximum similarity, gather the similarity scores in a window of
``±half_support_window/disparity_step`` indices around it (out-of-range taps
forced to ``-inf``; reference ``estimator.py:66-83``), softmax the window into
a distribution and return its mean disparity ``disparity_step * index``
(reference ``estimator.py:87-91``).

The reference materializes the window with a Python loop of ``th.gather``
calls. The TPU formulation eliminates the gather entirely: collecting the
taps at indices ``argmax ± s`` and softmaxing them is identical to a MASKED
softmax over the full disparity axis with mask ``|d - argmax| <= taps``
(out-of-range taps were ``-inf`` in the reference — exactly what masking
does). With disparity on the lane dimension, the whole estimator is a single
fused argmax + masked-softmax + expectation pass on the VPU, no
data-dependent addressing anywhere. Golden values pinned by the reference's
``test_estimator.py``: similarities [0.1, 0.4, 0.3, 0.2, 0.3] -> 1.52
(step=1) / 2.124 (step=2).
"""

from __future__ import annotations

import jax.numpy as jnp


def subpixel_map(similarities: jnp.ndarray,
                 half_support_window: int = 4,
                 disparity_step: int = 2) -> jnp.ndarray:
    """Returns sub-pixel disparities from a similarity volume.

    Args:
        similarities: ``[..., D]`` similarity scores, disparity index last.
            Index ``i`` corresponds to disparity ``i * disparity_step`` pixels.
        half_support_window: half-width of the support window in *pixels*
            (must be a positive multiple of ``disparity_step``; reference
            ``estimator.py:34-41``).
        disparity_step: pixel distance between adjacent disparity indices.

    Returns:
        ``[...]`` float disparities in pixels.
    """
    if disparity_step < 1:
        raise ValueError('"disparity_step" should be a positive integer.')
    if half_support_window < 1:
        raise ValueError('"half_support_window" should be a positive integer.')
    if half_support_window % disparity_step != 0:
        raise ValueError('"half_support_window" should be a multiple of '
                         '"disparity_step".')
    number_of_disparities = similarities.shape[-1]
    half_taps = half_support_window // disparity_step

    best_index = jnp.argmax(similarities, axis=-1, keepdims=True)
    index = jnp.arange(number_of_disparities)
    in_window = jnp.abs(index - best_index) <= half_taps

    # Masked softmax over the window (numerically shifted by the window max,
    # which is the argmax value itself). The exp/expectation math runs in
    # f32 with the upconvert INSIDE each pass (fused, register-level):
    # pre-casting a bf16 similarity volume to f32 materializes a 2x-size
    # buffer (~212 MB, ~2.8 ms at the benchmark shape — measured) for zero
    # extra precision, since the information content is bf16 either way.
    compute_dtype = jnp.promote_types(similarities.dtype, jnp.float32)
    shifted = (similarities.astype(compute_dtype)
               - jnp.max(similarities, axis=-1,
                         keepdims=True).astype(compute_dtype))
    weights = jnp.where(in_window, jnp.exp(shifted), 0.0)
    disparities = (disparity_step * index).astype(compute_dtype)
    return (jnp.sum(weights * disparities, axis=-1) /
            jnp.sum(weights, axis=-1))
