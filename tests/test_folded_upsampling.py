"""Exactness of the depth-folded 3D conv layer vs the dense NDHWC path.

The entire hourglass executes in folded [B, H, W, D*C] layout with banded
depth-mixing kernels (``ops/folded3d.py``). These tests pin every folded
primitive — and the full hourglass — to the plain NDHWC composition they
replace.
"""

import numpy as np
import jax
import jax.numpy as jnp

from practicaldeepstereo_nips2018_tpu.models import blocks, regularization
from practicaldeepstereo_nips2018_tpu.ops import folded3d


def test_fold_unfold_roundtrip():
    volume = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 3, 4, 6))
    folded = folded3d.fold(volume)
    assert folded.shape == (2, 3, 4, 30)
    assert np.array_equal(np.asarray(folded3d.unfold(folded, 5)),
                          np.asarray(volume))


def test_conv3d_folded_matches_dense():
    key = jax.random.PRNGKey(0)
    params = blocks.init_conv(key, 3, 6, 10, spatial_dims=3)
    volume = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 5, 6, 6))
    for stride in (1, 2):
        dense = blocks.conv(params, volume, stride=stride)
        folded, depth = folded3d.conv3d_folded(params,
                                               folded3d.fold(volume), 7,
                                               stride)
        assert depth == dense.shape[1]
        assert np.allclose(np.asarray(folded3d.unfold(folded, depth)),
                           np.asarray(dense), atol=1e-5), stride


def test_conv_block3d_folded_matches_dense():
    key = jax.random.PRNGKey(2)
    params = blocks.init_conv_block(key, 3, 6, 12, spatial_dims=3)
    volume = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 5, 7, 6))
    dense = blocks.conv_block(params, volume, stride=2)
    folded, depth = folded3d.conv_block3d_folded(params,
                                                 folded3d.fold(volume), 6,
                                                 stride=2)
    assert np.allclose(np.asarray(folded3d.unfold(folded, depth)),
                       np.asarray(dense), atol=1e-5)


def test_conv_transpose_block3d_folded_matches_dense():
    key = jax.random.PRNGKey(4)
    params = blocks.init_conv_transpose_block(key, 4, 8, 4, spatial_dims=3)
    volume = jax.random.normal(jax.random.PRNGKey(5), (2, 6, 5, 7, 8))
    dense = blocks.conv_transpose_block(params, volume, stride=2, padding=1)
    folded, depth = folded3d.conv_transpose_block3d_folded(
        params, folded3d.fold(volume), 6)
    assert depth == 12
    assert np.allclose(np.asarray(folded3d.unfold(folded, depth)),
                       np.asarray(dense), atol=1e-5)


def test_anisotropic_fullsize_matches_dense():
    key = jax.random.PRNGKey(6)
    params = blocks.init_conv_transpose(key, (3, 4, 4), 4, 1, spatial_dims=3)
    volume = jax.random.normal(jax.random.PRNGKey(7), (2, 6, 5, 7, 4))
    dense = blocks.conv_transpose(params, volume, stride=(1, 2, 2),
                                  padding=(1, 1, 1))
    dense_map = jnp.moveaxis(dense[..., 0], 1, -1)  # [B, 2H, 2W, D]
    folded = folded3d.anisotropic_fullsize_transpose(
        params, folded3d.fold(volume), 6)
    assert folded.shape == (2, 10, 14, 6)
    assert np.allclose(np.asarray(folded), np.asarray(dense_map), atol=1e-5)


def test_full_hourglass_folded_matches_ndhwc():
    params = regularization.init(jax.random.PRNGKey(0))
    signatures = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 32, 8))
    shortcut = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 32, 8))
    reference = regularization.apply_ndhwc(params, signatures, shortcut)
    folded = regularization.apply(params, signatures, shortcut)
    assert folded.shape == reference.shape == (1, 64, 128, 32)
    assert np.allclose(np.asarray(folded), np.asarray(reference),
                       atol=2e-4), \
        np.abs(np.asarray(folded) - np.asarray(reference)).max()
