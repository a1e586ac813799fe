"""Exactness of the depth-folded upsampling stages vs the dense 3D path.

The final two regularization stages run as grouped spatial transposed convs
over a depth-folded [B, H, W, D*C] layout (TPU lane alignment — see
``models/regularization.py``). These tests pin the decomposition to the
dense ``blocks.conv_transpose`` semantics it replaces.
"""

import numpy as np
import jax
import jax.numpy as jnp

from practicaldeepstereo_nips2018_tpu.models import blocks, regularization


def test_halfsize_folded_matches_dense():
    key = jax.random.PRNGKey(0)
    params = blocks.init_conv_transpose_block(key, 4, 8, 4, spatial_dims=3)
    volume = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 5, 7, 8))

    dense = blocks.conv_transpose_block(params, volume, stride=2, padding=1)
    # dense: [B, 2D, 2H, 2W, 4] -> folded comparison layout
    dense_folded = jnp.moveaxis(dense, 1, 3).reshape(2, 10, 14, 12 * 4)

    folded = regularization._upsample_to_halfsize_folded(params, volume)
    assert folded.shape == (2, 10, 14, 48)
    assert np.allclose(np.asarray(folded), np.asarray(dense_folded),
                       atol=1e-5), \
        np.abs(np.asarray(folded) - np.asarray(dense_folded)).max()


def test_fullsize_folded_matches_dense():
    key = jax.random.PRNGKey(2)
    params = blocks.init_conv_transpose(key, (3, 4, 4), 4, 1, spatial_dims=3)
    volume = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 5, 7, 4))

    dense = blocks.conv_transpose(params, volume, stride=(1, 2, 2),
                                  padding=(1, 1, 1))
    dense_map = jnp.moveaxis(dense[..., 0], 1, -1)  # [B, 2H, 2W, D]

    folded_in = jnp.moveaxis(volume, 1, 3).reshape(2, 5, 7, 6 * 4)
    folded = regularization._upsample_to_fullsize_folded(params, folded_in,
                                                         depth_levels=6)
    assert folded.shape == (2, 10, 14, 6)
    assert np.allclose(np.asarray(folded), np.asarray(dense_map),
                       atol=1e-5), \
        np.abs(np.asarray(folded) - np.asarray(dense_map)).max()
