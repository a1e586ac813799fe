"""Golden-number and semantics tests for the numerics kernel layer.

The golden values are taken from the REFERENCE's own unit tests (re-expressed
against this framework's channels-last API):
  * estimator goldens 1.52 / 2.124 — reference ``test/test_estimator.py:14-27``
  * loss golden 1.3654 + exact gradient — reference ``test/test_loss.py:12-37``
  * error metric goldens — reference ``test/test_errors.py:13-65``
  * size-adapter shape golden 63x100 -> 64x128 — ``test/test_size_adapter.py``
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from practicaldeepstereo_nips2018_tpu import ops


def test_pad_to_multiple_and_unpad():
    image = jax.random.uniform(jax.random.PRNGKey(0), (1, 63, 100, 10))
    padded = ops.pad_to_multiple(image)
    assert padded.shape == (1, 64, 128, 10)
    # Padding must land on the top and the left.
    assert np.all(np.asarray(padded[:, 0, :, :]) == 0)
    assert np.all(np.asarray(padded[:, :, :28, :]) == 0)
    unpadded = ops.unpad(padded, 63, 100)
    assert np.array_equal(np.asarray(unpadded), np.asarray(image))


def test_unpad_trailing_spatial_axes():
    disparity = jnp.arange(64 * 128, dtype=jnp.float32).reshape(1, 64, 128)
    cropped = ops.unpad(disparity, 63, 100, spatial_axes=(-2, -1))
    assert cropped.shape == (1, 63, 100)
    assert np.asarray(cropped)[0, 0, 0] == np.asarray(disparity)[0, 1, 28]


def test_subpixel_map_golden():
    similarities = jnp.asarray([0.1, 0.4, 0.3, 0.2, 0.3]).reshape(1, 1, 1, 5)
    disparity = ops.subpixel_map(similarities, half_support_window=2,
                                 disparity_step=1)
    assert np.isclose(float(disparity[0, 0, 0]), 1.52, atol=1e-4)

    disparity = ops.subpixel_map(similarities, half_support_window=2,
                                 disparity_step=2)
    assert np.isclose(float(disparity[0, 0, 0]), 2.124, atol=1e-4)


def test_subpixel_map_validation():
    with pytest.raises(ValueError):
        ops.subpixel_map(jnp.zeros((1, 4)), disparity_step=0)
    with pytest.raises(ValueError):
        ops.subpixel_map(jnp.zeros((1, 4)), half_support_window=0)
    with pytest.raises(ValueError):
        ops.subpixel_map(jnp.zeros((1, 4)), half_support_window=3,
                         disparity_step=2)


def test_subpixel_map_boundary():
    # Maximum at the last index: right taps fall outside and must be ignored
    # (-inf similarity, zero weight), not wrapped or clamped.
    similarities = jnp.asarray([0.0, 0.1, 5.0]).reshape(1, 3)
    disparity = ops.subpixel_map(similarities, half_support_window=2,
                                 disparity_step=1)
    expected = np.exp([0.0, 0.1, 5.0])
    expected = (expected / expected.sum() * np.array([0.0, 1.0, 2.0])).sum()
    assert np.isclose(float(disparity[0]), expected, atol=1e-5)


def test_subpixel_cross_entropy_golden():
    # Reference test/test_loss.py:12-37, transposed to disparity-last layout.
    similarities = jnp.asarray([[0.1, 0.3, 0.2, 0.05],
                                [0.2, 0.1, 0.4, 0.0],
                                [0.2, 0.1, 0.4, 0.0]]).reshape(1, 3, 1, 4)
    ground_truth = jnp.asarray([1.3, np.inf, 1.9]).reshape(1, 3, 1)
    weights = jnp.asarray([0.9, 0.0, 0.01]).reshape(1, 3, 1)

    def loss_fn(sims):
        return ops.subpixel_cross_entropy(sims, ground_truth, weights,
                                          diversity=2.0, disparity_step=1)

    value, gradient = jax.value_and_grad(loss_fn)(similarities)
    assert np.isclose(float(value), 1.3654, atol=1e-3)
    expected_gradient = np.array([
        [0.0262, -0.0567, -0.0219, 0.0524],
        [0.0, 0.0, 0.0, 0.0],
        [0.0011, -0.0002, -0.0007, -0.0002]]).reshape(1, 3, 1, 4)
    assert np.allclose(np.asarray(gradient), expected_gradient, atol=1e-3)


def test_subpixel_cross_entropy_unweighted_masks_infs():
    similarities = jnp.zeros((1, 2, 1, 4))
    ground_truth = jnp.asarray([2.0, np.inf]).reshape(1, 2, 1)
    value = ops.subpixel_cross_entropy(similarities, ground_truth,
                                       diversity=1.0, disparity_step=1)
    # Uniform similarities: CE = -log(1/4) regardless of the target.
    assert np.isclose(float(value), np.log(4.0), atol=1e-5)
    # Gradient through the masked pixel must be exactly zero.
    gradient = jax.grad(lambda s: ops.subpixel_cross_entropy(
        s, ground_truth, diversity=1.0, disparity_step=1))(similarities)
    assert np.all(np.asarray(gradient)[0, 1] == 0.0)


def test_absolute_error_golden():
    estimated = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    ground_truth = jnp.asarray([[2.0, 2.0], [np.inf, 1.0]])
    pixelwise, mean = ops.absolute_error(estimated, ground_truth)
    assert np.allclose(np.asarray(pixelwise), [[1.0, 0.0], [0.0, 3.0]])
    assert np.isclose(float(mean), 4.0 / 3.0, rtol=1e-3)
    _, median = ops.absolute_error(estimated, ground_truth, use_mean=False)
    assert np.isclose(float(median), 1.0, rtol=1e-3)
    # All-unknown ground truth -> 0.0.
    _, empty = ops.absolute_error(estimated, jnp.full((2, 2), np.inf))
    assert float(empty) == 0.0


def test_n_pixels_error_golden():
    estimated = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    ground_truth = jnp.asarray([[2.0, 2.0], [np.inf, 1.0]])
    pixelwise, percentage = ops.n_pixels_error(estimated, ground_truth, n=1.0)
    assert np.allclose(np.asarray(pixelwise), [[0.0, 0.0], [0.0, 1.0]])
    assert np.isclose(float(percentage), 100.0 / 3.0, rtol=1e-3)
    _, empty = ops.n_pixels_error(estimated, jnp.full((2, 2), np.inf), n=1.0)
    assert float(empty) == 0.0


def test_metrics_are_jittable():
    estimated = jnp.ones((4, 4))
    ground_truth = jnp.full((4, 4), 2.0)
    _, mean = jax.jit(ops.absolute_error)(estimated, ground_truth)
    assert np.isclose(float(mean), 1.0)
    _, pct = jax.jit(ops.n_pixels_error)(estimated, ground_truth)
    assert float(pct) == 0.0
