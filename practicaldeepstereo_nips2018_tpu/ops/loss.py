"""Sub-pixel cross-entropy loss.

Re-implements the reference's ``SubpixelCrossEntropy`` (reference
``loss.py:16-78``): the target distribution over disparity indices is an
**unnormalized Laplace** ``exp(-|gt - d|/diversity) / (2*diversity)`` centered
at the float ground truth (reference ``loss.py:12-13``), and the loss is

    - sum_d log_softmax(similarities)_d * P_target(d) / sum_d P_target(d)

averaged over pixels with known ground truth (pixels with ``gt == inf`` are
excluded; reference ``loss.py:52-53,71-73``). With per-pixel ``weights`` the
average becomes ``sum(w*ce) / (sum(w) + 1e-15)`` over valid pixels
(reference ``loss.py:74-77``).

The reference accumulates the sums in a Python loop over disparity indices
(``loss.py:62-70``); here the Laplace weights for every index are produced by
one broadcasted expression over the disparity-last axis, which XLA fuses with
the log-softmax into a single VPU pass.

Golden value pinned by the reference's ``test_loss.py``: fixed 4-disparity
similarities, gt [1.3, inf, 1.9], weights [0.9, 0, 0.01], diversity=2.0,
step=1 -> loss 1.3654 and an exact gradient tensor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def subpixel_cross_entropy(similarities: jnp.ndarray,
                           ground_truth_disparities: jnp.ndarray,
                           weights: jnp.ndarray | None = None,
                           diversity: float = 1.0,
                           disparity_step: int = 2) -> jnp.ndarray:
    """Returns the scalar sub-pixel cross-entropy loss.

    Args:
        similarities: ``[..., D]`` similarity scores, disparity index last.
            Index ``i`` corresponds to disparity ``i * disparity_step``.
        ground_truth_disparities: ``[...]`` float disparities in pixels;
            unknown locations set to ``inf``.
        weights: optional ``[...]`` per-pixel weights.
        diversity: Laplace diversity of the target distribution.
        disparity_step: pixel distance between adjacent disparity indices.
    """
    number_of_disparities = similarities.shape[-1]
    valid = jnp.isfinite(ground_truth_disparities)
    # Keep NaN/Inf out of the graph for masked pixels so gradients stay clean.
    safe_ground_truth = jnp.where(valid, ground_truth_disparities, 0.0)

    disparities = (
        jnp.arange(number_of_disparities, dtype=similarities.dtype)
        * disparity_step)
    target = jnp.exp(
        -jnp.abs(safe_ground_truth[..., None] - disparities) / diversity) / (
            2.0 * diversity)

    log_predicted = jax.nn.log_softmax(similarities, axis=-1)
    cross_entropy = -jnp.sum(target * log_predicted, axis=-1) / jnp.sum(
        target, axis=-1)

    valid_f = valid.astype(cross_entropy.dtype)
    if weights is None:
        return jnp.sum(cross_entropy * valid_f) / jnp.sum(valid_f)
    masked_weights = weights * valid_f
    return jnp.sum(masked_weights * cross_entropy) / (
        jnp.sum(masked_weights) + 1e-15)
