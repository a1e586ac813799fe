"""Tests for the cost-volume build and matching stage.

Pins (a) the reference's exact shift/zero-fill golden volume
(reference ``test/test_matching.py:17-32``, re-expressed channels-last),
(b) the equivalence of the linearity-factored fast build against a direct
per-disparity loop with the same head conv, and (c) the matching stage's
output shape contract (reference ``test/test_matching.py:35-40``).
"""

import numpy as np
import jax
import jax.numpy as jnp

from practicaldeepstereo_nips2018_tpu.models import matching
from practicaldeepstereo_nips2018_tpu.ops import costvolume


def _volume_with_mockup_max_operation(left, right, maximum_disparity):
    """Channel-max mockup of the reference golden test: build the raw
    shifted concat volume and reduce channels with max."""
    width = left.shape[-2]
    padded = jnp.pad(right, [(0, 0), (0, 0), (maximum_disparity, 0), (0, 0)])
    rows = []
    for d in range(maximum_disparity + 1):
        shifted = jax.lax.slice_in_dim(
            padded, maximum_disparity - d, maximum_disparity - d + width,
            axis=2)
        concatenated = jnp.concatenate([left, shifted], axis=-1)
        rows.append(jnp.max(concatenated, axis=-1, keepdims=True))
    return jnp.stack(rows, axis=1)


def test_shift_concat_golden():
    # Reference golden: left [0,2,1,2], right [3,4,2,4], D=2 ->
    # [[3,4,2,4],[0,3,4,2],[0,2,3,4]] (test_matching.py:17-32).
    left = jnp.asarray([0.0, 2.0, 1.0, 2.0]).reshape(1, 1, 4, 1)
    right = jnp.asarray([3.0, 4.0, 2.0, 4.0]).reshape(1, 1, 4, 1)
    volume = _volume_with_mockup_max_operation(left, right, 2)
    expected = np.array([[3, 4, 2, 4], [0, 3, 4, 2],
                         [0, 2, 3, 4]]).reshape(1, 3, 1, 4, 1)
    assert np.allclose(np.asarray(volume), expected)
    volume = _volume_with_mockup_max_operation(left, right, 1)
    expected = np.array([[3, 4, 2, 4], [0, 3, 4, 2]]).reshape(1, 2, 1, 4, 1)
    assert np.allclose(np.asarray(volume), expected)


def test_factored_build_equals_direct_loop():
    key = jax.random.PRNGKey(0)
    head = matching.init(key)["head"]
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    left = jax.random.normal(k1, (2, 6, 20, 64))
    right = jax.random.normal(k2, (2, 6, 20, 64))
    for maximum_disparity in (0, 3, 15, 25):
        direct = costvolume.cost_volume_direct(head, left, right,
                                               maximum_disparity)
        fast = costvolume.build_cost_volume(head, left, right,
                                            maximum_disparity)
        assert fast.shape == direct.shape
        assert np.allclose(np.asarray(fast), np.asarray(direct), atol=1e-4), \
            f"mismatch at D={maximum_disparity}"


def test_deep_factored_conv1_volume_equals_direct():
    """conv1 (the tail's first conv — the last linear point) factored
    through the shift-assembly must equal conv1 applied per-disparity to
    the direct-loop volume, incl. every boundary case: d=0 left seam,
    right truncation smears, conv1's own right seam, and d >= width."""
    from practicaldeepstereo_nips2018_tpu.models import blocks

    key = jax.random.PRNGKey(0)
    params = matching.init(key)
    head = params["head"]
    conv1 = params["residual1"]["block1"]["conv"]
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    left = jax.random.normal(k1, (2, 6, 20, 64))
    right = jax.random.normal(k2, (2, 6, 20, 64))
    width = left.shape[2]

    for maximum_disparity in (1, 3, 15, 25):
        direct = costvolume.cost_volume_direct(head, left, right,
                                               maximum_disparity)
        batch, levels, height, _, channels = direct.shape
        expected = blocks.conv(
            conv1, direct.reshape(batch * levels, height, width, channels))
        expected = expected.reshape(batch, levels, height, width, -1)

        planes = costvolume.matching_head_planes(head, left, right)
        deep_planes = costvolume.conv1_volume_planes(conv1, *planes)
        paired = costvolume.assemble_conv1_volume_paired(
            deep_planes, maximum_disparity, width)
        # paired [B, P, H, W, 2*C1] -> [B, D+1, H, W, C1]
        assembled = paired.reshape(batch, levels // 2, height, width, 2, -1)
        assembled = jnp.moveaxis(assembled, 4, 2).reshape(
            batch, levels, height, width, -1)
        assert np.allclose(np.asarray(assembled), np.asarray(expected),
                           atol=1e-4), (
            f"D={maximum_disparity}: max err "
            f"{np.abs(np.asarray(assembled) - np.asarray(expected)).max()}")


def test_apply_folded_factor_conv1_matches_oracle():
    """Both tail execution paths (deep-factored conv1 on/off) must produce
    the fold of the unpaired oracle."""
    from practicaldeepstereo_nips2018_tpu.ops import folded3d

    params = matching.init(jax.random.PRNGKey(0))
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    left = jax.random.normal(k1, (1, 6, 20, 64))
    right = jax.random.normal(k2, (1, 6, 20, 64))
    oracle = folded3d.fold(matching.apply(params, left, right, 15))
    for factor in (True, False):
        out = matching.apply_folded(params, left, right, 15,
                                    factor_conv1=factor)
        assert np.allclose(np.asarray(out), np.asarray(oracle),
                           atol=1e-4), f"factor_conv1={factor}"


def test_factored_build_disparity_exceeding_width():
    # Disparities larger than the image width must degenerate to the pure
    # left plane (all right taps are zero fill), like the reference's
    # fully-shifted-out case.
    key = jax.random.PRNGKey(2)
    head = matching.init(key)["head"]
    left = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 5, 64))
    right = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 5, 64))
    direct = costvolume.cost_volume_direct(head, left, right, 7)
    fast = costvolume.build_cost_volume(head, left, right, 7)
    assert np.allclose(np.asarray(fast), np.asarray(direct), atol=1e-4)
    left_plane, _, _ = costvolume.matching_head_planes(head, left, right)
    assert np.allclose(np.asarray(fast[:, 7]), np.asarray(left_plane),
                       atol=1e-5)


def test_matching_stage_output_shape():
    # Reference test_matching.py:35-40: 128-ch concat -> 8-ch signature.
    params = matching.init(jax.random.PRNGKey(0))
    left = jax.random.normal(jax.random.PRNGKey(1), (2, 25, 25, 64))
    right = jax.random.normal(jax.random.PRNGKey(2), (2, 25, 25, 64))
    signatures = matching.apply(params, left, right, maximum_disparity=15)
    assert signatures.shape == (2, 16, 25, 25, 8)


def test_paired_volume_matches_unpaired():
    key = jax.random.PRNGKey(5)
    head = matching.init(key)["head"]
    left = jax.random.normal(jax.random.PRNGKey(6), (1, 6, 9, 64))
    right = jax.random.normal(jax.random.PRNGKey(7), (1, 6, 9, 64))
    for maximum_disparity in (3, 15, 25):
        unpaired = costvolume.build_cost_volume(head, left, right,
                                                maximum_disparity)
        paired = costvolume.build_cost_volume_paired(head, left, right,
                                                     maximum_disparity)
        batch, pairs, height, width, lanes = paired.shape
        assert pairs == (maximum_disparity + 1) // 2 and lanes == 128
        # [B, P, H, W, 2C] -> [B, D, H, W, C]
        as_unpaired = np.moveaxis(
            np.asarray(paired).reshape(batch, pairs, height, width, 2, 64),
            4, 2).reshape(batch, 2 * pairs, height, width, 64)
        assert np.allclose(as_unpaired, np.asarray(unpaired), atol=1e-4), \
            f"mismatch at D={maximum_disparity}"


def test_apply_folded_matches_apply():
    from practicaldeepstereo_nips2018_tpu.ops import folded3d
    params = matching.init(jax.random.PRNGKey(0))
    left = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 18, 64))
    right = jax.random.normal(jax.random.PRNGKey(2), (1, 12, 18, 64))
    for maximum_disparity in (15, 2):  # even count (paired) + odd (fallback)
        reference = folded3d.fold(
            matching.apply(params, left, right, maximum_disparity))
        folded = matching.apply_folded(params, left, right,
                                       maximum_disparity)
        assert folded.shape == reference.shape
        assert np.allclose(np.asarray(folded), np.asarray(reference),
                           atol=1e-4), f"D={maximum_disparity}"


def test_int8_tail_close_to_float():
    """The int8-quantized tail is an approximation; at the matching-stage
    level its folded signatures must stay close to the float path (the
    accuracy contract on REAL data is pinned end-to-end in
    ``tests/test_real_fixture_parity.py::test_int8_eval_accuracy``)."""
    params = matching.init(jax.random.PRNGKey(0))
    key_l, key_r = jax.random.split(jax.random.PRNGKey(1))
    left = jax.random.normal(key_l, (1, 16, 24, 64))
    right = jax.random.normal(key_r, (1, 16, 24, 64))

    exact = matching.apply_folded(params, left, right, 7)
    quantized = matching.apply_folded(params, left, right, 7,
                                      tail_int8=True)
    difference = np.abs(np.asarray(exact) - np.asarray(quantized))
    scale = np.abs(np.asarray(exact)).max()
    assert difference.max() / scale < 0.1, (difference.max(), scale)


def test_int8_tail_is_per_example_independent():
    """The int8 activation scales are per (example, pair) batch entry: a
    batch-of-two eval must produce bit-identical signatures to two
    independent batch-1 evals (the trainer's data-sharded batched eval
    promises per-example equivalence to the sequential protocol)."""
    params = matching.init(jax.random.PRNGKey(0))
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    left = jax.random.normal(keys[0], (2, 16, 24, 64))
    right = jax.random.normal(keys[1], (2, 16, 24, 64))
    # Second example scaled 10x: a whole-tensor quantization scale would
    # visibly coarsen example 0's grid.
    left = left.at[1].mul(10.0)
    right = right.at[1].mul(10.0)

    batched = matching.apply_folded(params, left, right, 7, tail_int8=True)
    singles = [
        matching.apply_folded(params, left[i:i + 1], right[i:i + 1], 7,
                              tail_int8=True)
        for i in range(2)
    ]
    np.testing.assert_array_equal(np.asarray(batched[0]),
                                  np.asarray(singles[0][0]))
    np.testing.assert_array_equal(np.asarray(batched[1]),
                                  np.asarray(singles[1][0]))
