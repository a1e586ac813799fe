"""Depth-banded folded convs == dense folded convs (``ops/folded_banded``).

The banded slab formulation must reproduce ``folded3d.conv3d_folded``
exactly (same math, different tiling); pinned for the XLA slab form and the
Pallas kernel (interpret mode on CPU), over the hourglass's real
depth/channel combinations including partial last groups and stride 2.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from practicaldeepstereo_nips2018_tpu.models import blocks
from practicaldeepstereo_nips2018_tpu.ops import folded3d, folded_banded


def _setup(depth, cin, cout, height=12, width=16, seed=0):
    params = blocks.init_conv(jax.random.PRNGKey(seed), 3, cin, cout,
                              spatial_dims=3)
    folded = jax.random.uniform(jax.random.PRNGKey(seed + 1),
                                (2, height, width, depth * cin))
    return params, folded


@pytest.mark.parametrize("depth,cin,cout,stride", [
    (48, 8, 8, 1),     # hourglass smoothing / expansion4 smooth
    (48, 8, 16, 2),    # contraction1 down
    (24, 16, 16, 1),   # contraction1 smooth
    (24, 16, 32, 2),   # contraction2 down
    (12, 32, 32, 1),   # contraction2 smooth
    (6, 64, 64, 1),    # deep smooth (partial group: 2 groups of 3 depths)
    (5, 8, 8, 1),      # odd depth — partial last group
])
def test_slab_matches_dense(depth, cin, cout, stride):
    params, folded = _setup(depth, cin, cout)
    dense, _ = folded3d.conv3d_folded(params, folded, depth, stride)
    slab = folded_banded.conv3d_folded_slab(params, folded, depth, stride)
    assert slab.shape == dense.shape
    np.testing.assert_allclose(np.asarray(slab), np.asarray(dense),
                               atol=1e-5)


@pytest.mark.parametrize("depth,cin,cout", [
    (48, 8, 4),     # upsample_to_halfsize (D 48 -> 96)
    (24, 16, 8),    # expansion4 up
    (12, 32, 16),   # expansion3 up
    (3, 128, 64),   # expansion1 up (partial group: 2 depths < 6)
])
def test_transpose_slab_matches_dense(depth, cin, cout):
    params = blocks.init_conv(jax.random.PRNGKey(2), 4, cin, cout,
                              spatial_dims=3)
    folded = jax.random.uniform(jax.random.PRNGKey(3),
                                (2, 6, 10, depth * cin))
    dense, _ = folded3d.conv_transpose3d_folded(params, folded, depth)
    slab = folded_banded.conv_transpose3d_folded_slab(params, folded, depth)
    assert slab.shape == dense.shape
    np.testing.assert_allclose(np.asarray(slab), np.asarray(dense),
                               atol=1e-5)


@pytest.mark.parametrize("depth,cin,cout", [
    (48, 8, 4),
    (24, 16, 8),
    (3, 128, 64),
])
def test_transpose_phased_matches_dense(depth, cin, cout):
    params = blocks.init_conv(jax.random.PRNGKey(2), 4, cin, cout,
                              spatial_dims=3)
    folded = jax.random.uniform(jax.random.PRNGKey(3),
                                (2, 6, 10, depth * cin))
    dense, _ = folded3d.conv_transpose3d_folded(params, folded, depth)
    phased = folded_banded.conv_transpose3d_folded_phased(params, folded,
                                                          depth)
    assert phased.shape == dense.shape
    np.testing.assert_allclose(np.asarray(phased), np.asarray(dense),
                               atol=1e-5)


def test_anisotropic_phased_matches_dense():
    params = blocks.init_conv(jax.random.PRNGKey(4), (3, 4, 4), 4, 1,
                              spatial_dims=3)
    folded = jax.random.uniform(jax.random.PRNGKey(5), (2, 6, 10, 96 * 4))
    dense = folded3d.anisotropic_fullsize_transpose(params, folded, 96)
    phased = folded_banded.anisotropic_fullsize_transpose_phased(
        params, folded, 96)
    assert phased.shape == dense.shape
    np.testing.assert_allclose(np.asarray(phased), np.asarray(dense),
                               atol=1e-5)


def test_network_banded_impl_matches_dense():
    """Full forward with config.folded_conv_impl='banded_slab' equals the
    dense execution (same math, different conv tiling)."""
    from practicaldeepstereo_nips2018_tpu import models

    dense_config = models.PDSConfig(maximum_disparity=63)
    banded_config = models.PDSConfig(maximum_disparity=63,
                                     folded_conv_impl="banded_slab")
    params = models.init(jax.random.PRNGKey(0), dense_config)
    keys = jax.random.split(jax.random.PRNGKey(1))
    left = jax.random.uniform(keys[0], (1, 64, 128, 3)) * 255.0
    right = jax.random.uniform(keys[1], (1, 64, 128, 3)) * 255.0

    dense = models.apply(params, left, right, dense_config)
    banded = models.apply(params, left, right, banded_config)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                               atol=5e-4)


@pytest.mark.parametrize("depth,cin,cout", [
    (48, 8, 8),
    (24, 16, 16),
    (12, 32, 32),
])
def test_pallas_matches_dense_interpret(depth, cin, cout):
    params, folded = _setup(depth, cin, cout, height=8, width=16)
    dense, _ = folded3d.conv3d_folded(params, folded, depth, 1)
    kernel = folded_banded.conv3d_folded_pallas(params, folded, depth,
                                                stride=1, interpret=True)
    assert kernel.shape == dense.shape
    np.testing.assert_allclose(np.asarray(kernel), np.asarray(dense),
                               atol=1e-5)
