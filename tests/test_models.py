"""Shape-contract tests for the model stack, mirroring the reference suite.

Reference contracts reproduced (channels-last):
  * embedding: 100x100 image -> 25x25 descriptor with 64 + 8 channels
    (``test/test_embedding.py:11-17``);
  * regularization: contraction ceil-halves odd dims (10,14,16 -> 5,7,8),
    expansion doubles, full module 32^3 volume -> (2, 128, 128, 64)
    (``test/test_regularization.py:11-36``);
  * network: non-multiple-of-64 input 62x49; D=63 -> 32 similarity levels,
    D=255 -> 128; inference -> (1, 62, 49) disparity map
    (``test/test_network.py:11-27``), and the (D+1) % 64 validation
    (``network.py:26-36``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from practicaldeepstereo_nips2018_tpu.models import (
    embedding, network, regularization)


def test_embedding_output_size():
    params = embedding.init(jax.random.PRNGKey(0))
    image = jax.random.uniform(jax.random.PRNGKey(1), (2, 100, 100, 3)) * 255
    descriptor, shortcut = embedding.apply(params, image)
    assert descriptor.shape == (2, 25, 25, 64)
    assert shortcut.shape == (2, 25, 25, 8)


def test_unknown_folded_conv_impl_rejected():
    from practicaldeepstereo_nips2018_tpu import models

    with pytest.raises(ValueError, match="folded_conv_impl"):
        models.PDSConfig(maximum_disparity=63, folded_conv_impl="slab")


def test_unknown_remat_policy_rejected():
    from practicaldeepstereo_nips2018_tpu import models

    with pytest.raises(ValueError, match="remat"):
        models.PDSConfig(maximum_disparity=63, remat="everything")


def test_embedding_apply_pair_matches_separate_padded_calls():
    """The fused batched front-end (cast-first, pad+instance-norm in one
    pass, both images in one tower call) must equal the plain path:
    ``apply(pad(image))`` per image — the reference's order SizeAdapter.pad
    THEN InstanceNorm, whose moments include the pad zeros."""
    from practicaldeepstereo_nips2018_tpu.ops import pad as pad_ops

    params = embedding.init(jax.random.PRNGKey(0))
    keys = jax.random.split(jax.random.PRNGKey(1))
    left = jax.random.uniform(keys[0], (2, 52, 100, 3)) * 255
    right = jax.random.uniform(keys[1], (2, 52, 100, 3)) * 255

    pad_h, pad_w = pad_ops.pad_amounts(52, 100, 64)  # (12, 28)
    left_ref, shortcut_ref = embedding.apply(
        params, pad_ops.pad_to_multiple(left, 64))
    right_ref, _ = embedding.apply(params, pad_ops.pad_to_multiple(right, 64))

    left_desc, right_desc, shortcut = embedding.apply_pair(
        params, left, right, pad_h, pad_w)
    np.testing.assert_allclose(np.asarray(left_desc), np.asarray(left_ref),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(right_desc), np.asarray(right_ref),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(shortcut), np.asarray(shortcut_ref),
                               atol=2e-4)


def test_contraction_block_output_size():
    params = regularization.init(jax.random.PRNGKey(0),
                                 number_of_features=6)["contraction1"]
    block_input = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 14, 16, 6))
    down, smooth = regularization.contraction_block(params, block_input)
    assert down.shape == (2, 5, 7, 8, 12)
    assert smooth.shape == (2, 5, 7, 8, 12)


def test_expansion_block_output_size():
    # Width-6 expansion: 6 -> 3 channels, 2x upsample, matches reference
    # test_regularization.py:20-27.
    from practicaldeepstereo_nips2018_tpu.models import blocks
    key = jax.random.PRNGKey(0)
    params = {
        "up": blocks.init_conv_transpose_block(key, 4, 6, 3, spatial_dims=3),
        "smooth": blocks.init_conv_block(key, 3, 3, 3, spatial_dims=3),
    }
    block_input = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 14, 16, 6))
    shortcut = jax.random.normal(jax.random.PRNGKey(2), (2, 20, 28, 32, 3))
    out = regularization.expansion_block(params, block_input, shortcut)
    assert out.shape == (2, 20, 28, 32, 3)


def test_regularization_output_size():
    params = regularization.init(jax.random.PRNGKey(0))
    signatures = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 32, 8))
    shortcut = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 8))
    similarities = regularization.apply(params, signatures, shortcut)
    # Reference returns (2, 64, 128, 128) in NCHW; disparity-last here.
    assert similarities.shape == (2, 128, 128, 64)


def test_pds_network_shapes():
    config = network.PDSConfig(maximum_disparity=63)
    params = network.init(jax.random.PRNGKey(0), config)
    left = jax.random.uniform(jax.random.PRNGKey(1), (1, 62, 49, 3)) * 255
    right = jax.random.uniform(jax.random.PRNGKey(2), (1, 62, 49, 3)) * 255

    similarities = network.apply(params, left, right, config)
    assert similarities.shape == (1, 62, 49, 32)

    config_255 = network.PDSConfig(maximum_disparity=255)
    similarities = network.apply(params, left, right, config_255)
    assert similarities.shape == (1, 62, 49, 128)

    disparity = network.infer(params, left, right, config)
    assert disparity.shape == (1, 62, 49)
    assert np.all(np.isfinite(np.asarray(disparity)))
    assert np.asarray(disparity).min() >= 0.0
    assert np.asarray(disparity).max() <= 63.0


def test_maximum_disparity_validation():
    with pytest.raises(ValueError):
        network.PDSConfig(maximum_disparity=64)
    with pytest.raises(ValueError):
        network.validate_maximum_disparity(100)
    network.validate_maximum_disparity(191)


def test_network_is_jittable_and_differentiable():
    config = network.PDSConfig(maximum_disparity=63)
    params = network.init(jax.random.PRNGKey(0), config)
    left = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 255
    right = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 255

    @jax.jit
    def loss_fn(p):
        sims = network.apply(p, left, right, config)
        return jnp.mean(jnp.square(sims))

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(grads)
    assert leaves
    assert all(np.all(np.isfinite(np.asarray(leaf))) for leaf in leaves)
    # Gradients must reach every parameter group.
    total = sum(float(jnp.sum(jnp.abs(leaf))) for leaf in leaves)
    assert total > 0.0


def test_network_is_differentiable_in_bfloat16():
    """The bf16 compute path must have a well-typed backward pass (an
    f32-output conv of bf16 operands makes the kernel-gradient convolution
    mixed-dtype, which lax rejects — regression guard for the training
    path used on TPU)."""
    config = network.PDSConfig(maximum_disparity=63, remat=True)
    params = network.init(jax.random.PRNGKey(0), config)
    left = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 255
    right = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 255

    @jax.jit
    def loss_fn(p):
        sims = network.apply(p, left, right, config,
                             compute_dtype=jnp.bfloat16)
        return jnp.mean(jnp.square(sims))

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(leaf))) for leaf in leaves)
    assert sum(float(jnp.sum(jnp.abs(leaf))) for leaf in leaves) > 0.0


@pytest.mark.parametrize("remat", [True, "selective"])
def test_remat_config_matches_values(remat):
    """Both remat policies (blanket and selective) are numerics-preserving
    for the loss and every parameter gradient."""
    config = network.PDSConfig(maximum_disparity=63, remat=remat)
    baseline = network.PDSConfig(maximum_disparity=63)
    params = network.init(jax.random.PRNGKey(0), baseline)
    left = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 255
    right = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 255
    gt = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64)) * 40.0

    from practicaldeepstereo_nips2018_tpu import ops as pds_ops

    def loss(p, cfg):
        return pds_ops.subpixel_cross_entropy(
            network.apply(p, left, right, cfg), gt)

    value_base, grads_base = jax.value_and_grad(loss)(params, baseline)
    value_remat, grads_remat = jax.value_and_grad(loss)(params, config)
    assert np.isclose(float(value_base), float(value_remat), atol=1e-6)
    worst = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(grads_base),
                        jax.tree.leaves(grads_remat)))
    assert worst < 1e-4, worst


def test_embedding_s2d_config_matches_values():
    """PDSConfig(embedding_s2d=True) is an exact execution alternative:
    same similarities and same gradients as the default front-end."""
    config = network.PDSConfig(maximum_disparity=63, embedding_s2d=True)
    baseline = network.PDSConfig(maximum_disparity=63)
    params = network.init(jax.random.PRNGKey(0), baseline)
    left = jax.random.uniform(jax.random.PRNGKey(1), (1, 62, 70, 3)) * 255
    right = jax.random.uniform(jax.random.PRNGKey(2), (1, 62, 70, 3)) * 255
    gt = jax.random.uniform(jax.random.PRNGKey(3), (1, 62, 70)) * 40.0

    from practicaldeepstereo_nips2018_tpu import ops as pds_ops

    def loss(p, cfg):
        return pds_ops.subpixel_cross_entropy(
            network.apply(p, left, right, cfg), gt)

    value_base, grads_base = jax.value_and_grad(loss)(params, baseline)
    value_s2d, grads_s2d = jax.value_and_grad(loss)(params, config)
    assert np.isclose(float(value_base), float(value_s2d), atol=1e-5)
    worst = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(grads_base),
                        jax.tree.leaves(grads_s2d)))
    assert worst < 1e-3, worst
