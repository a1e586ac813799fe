"""Semantic parity tests for primitive blocks against PyTorch CPU ops.

The reference delegates every kernel to torch (Conv2d/Conv3d/ConvTranspose3d/
InstanceNorm); these tests pin this framework's channels-last lax
formulations to the exact same math (padding alignment, stride phase,
transposed-conv output placement, norm epsilon/variance conventions) without
copying any reference code.
"""

import numpy as np
import jax.numpy as jnp
import jax
import torch
import pytest

from practicaldeepstereo_nips2018_tpu.models import blocks


def _conv_params_from_torch(torch_conv):
    """Torch OIHW / OIDHW weight -> lax HWIO / DHWIO."""
    w = torch_conv.weight.detach().numpy()
    spatial = w.ndim - 2
    # [O, I, *k] -> [*k, I, O]
    w = np.moveaxis(w, (0, 1), (-1, -2))
    b = torch_conv.bias.detach().numpy()
    return {"w": jnp.asarray(w.copy()), "b": jnp.asarray(b)}, spatial


def _tconv_params_from_torch(torch_conv):
    """Torch ConvTranspose IOHW weight -> this framework's gather layout.

    Torch's transposed conv scatters with weight [I, O, *k]; the equivalent
    gather formulation correlates with the spatially flipped kernel in
    [*k, I, O] order (I = input channels of x).
    """
    w = torch_conv.weight.detach().numpy()  # [I, O, *k]
    spatial = w.ndim - 2
    w = np.flip(w, axis=tuple(range(2, w.ndim)))  # spatial flip
    w = np.moveaxis(w, (0, 1), (-2, -1))  # -> [*k, I, O]
    b = torch_conv.bias.detach().numpy()
    return {"w": jnp.asarray(w.copy()), "b": jnp.asarray(b)}


@pytest.mark.parametrize("size,stride,kernel", [
    ((10, 10), 1, 3), ((11, 13), 2, 5), ((10, 14), 2, 3), ((9, 9), 2, 5),
])
def test_conv2d_matches_torch(size, stride, kernel):
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(3, 6, kernel, stride=stride, padding=kernel // 2)
    x = torch.randn(2, 3, *size)
    expected = conv(x).detach().numpy()
    params, _ = _conv_params_from_torch(conv)
    got = blocks.conv(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                      stride=stride)
    assert got.shape == tuple(np.moveaxis(expected, 1, -1).shape)
    assert np.allclose(np.asarray(got), np.moveaxis(expected, 1, -1),
                       atol=1e-5)


@pytest.mark.parametrize("size,stride", [((6, 8, 10), 1), ((7, 9, 10), 2),
                                         ((10, 14, 16), 2)])
def test_conv3d_matches_torch(size, stride):
    torch.manual_seed(1)
    conv = torch.nn.Conv3d(4, 5, 3, stride=stride, padding=1)
    x = torch.randn(2, 4, *size)
    expected = conv(x).detach().numpy()
    params, _ = _conv_params_from_torch(conv)
    got = blocks.conv(params,
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1)),
                      stride=stride)
    assert np.allclose(np.asarray(got), np.moveaxis(expected, 1, -1),
                       atol=1e-5)


def test_conv_transpose3d_4x4x4_stride2_matches_torch():
    torch.manual_seed(2)
    conv = torch.nn.ConvTranspose3d(6, 3, 4, stride=2, padding=1)
    x = torch.randn(2, 6, 5, 7, 8)
    expected = conv(x).detach().numpy()
    params = _tconv_params_from_torch(conv)
    got = blocks.conv_transpose(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1)),
        stride=2, padding=1)
    assert got.shape == (2, 10, 14, 16, 3)
    assert np.allclose(np.asarray(got), np.moveaxis(expected, 1, -1),
                       atol=1e-5)


def test_conv_transpose3d_anisotropic_matches_torch():
    # The final upsampler: kernel (3,4,4), stride (1,2,2), padding (1,1,1)
    # (reference network_blocks.py:37-44).
    torch.manual_seed(3)
    conv = torch.nn.ConvTranspose3d(4, 1, (3, 4, 4), stride=(1, 2, 2),
                                    padding=(1, 1, 1))
    x = torch.randn(1, 4, 6, 5, 7)
    expected = conv(x).detach().numpy()
    params = _tconv_params_from_torch(conv)
    got = blocks.conv_transpose(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1)),
        stride=(1, 2, 2), padding=(1, 1, 1))
    assert got.shape == (1, 6, 10, 14, 1)
    assert np.allclose(np.asarray(got), np.moveaxis(expected, 1, -1),
                       atol=1e-5)


def test_instance_norm2d_matches_torch():
    torch.manual_seed(4)
    x = torch.randn(2, 5, 9, 11) * 3 + 1
    expected = torch.nn.InstanceNorm2d(5)(x).numpy()
    got = blocks.instance_norm(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert np.allclose(np.asarray(got), np.moveaxis(expected, 1, -1),
                       atol=1e-5)


def test_instance_norm3d_affine_matches_torch():
    torch.manual_seed(5)
    norm = torch.nn.InstanceNorm3d(4, affine=True)
    with torch.no_grad():
        norm.weight.uniform_(0.5, 1.5)
        norm.bias.uniform_(-0.5, 0.5)
    x = torch.randn(2, 4, 3, 5, 7) * 2 - 1
    expected = norm(x).detach().numpy()
    params = {"scale": jnp.asarray(norm.weight.detach().numpy()),
              "bias": jnp.asarray(norm.bias.detach().numpy())}
    got = blocks.instance_norm(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1)), params)
    assert np.allclose(np.asarray(got), np.moveaxis(expected, 1, -1),
                       atol=1e-5)


def test_leaky_relu_slope():
    x = jnp.asarray([-2.0, -0.5, 0.0, 1.5])
    assert np.allclose(np.asarray(blocks.leaky_relu(x)),
                       [-0.2, -0.05, 0.0, 1.5])


def test_residual_block_identity_path():
    key = jax.random.PRNGKey(0)
    params = blocks.init_residual_block(key, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 6, 8))
    out = blocks.residual_block(params, x)
    assert out.shape == x.shape
    # Zeroing the second conv block's output (weights AND norm affine) must
    # reduce the block to bias-normalized noise + identity; sanity-check the
    # identity path is actually wired in.
    zeroed = jax.tree.map(jnp.zeros_like, params)
    out_zeroed = blocks.residual_block(zeroed, x)
    assert np.allclose(np.asarray(out_zeroed), np.asarray(x), atol=1e-5)


def test_init_shapes_and_scale():
    params = blocks.init_conv(jax.random.PRNGKey(0), 3, 16, 32)
    assert params["w"].shape == (3, 3, 16, 32)
    assert params["b"].shape == (32,)
    bound = 1.0 / np.sqrt(16 * 9)
    assert np.abs(np.asarray(params["w"])).max() <= bound
    tparams = blocks.init_conv_transpose(jax.random.PRNGKey(1), 4, 8, 4,
                                         spatial_dims=3)
    assert tparams["w"].shape == (4, 4, 4, 8, 4)


def test_space_to_depth_conv_matches_direct_5x5_stride2():
    """The s2d form of the embedding's first conv is EXACT: 5x5-stride-2-
    pad-2 on the image == 3x3-stride-1-pad-1 of the embedded kernel on the
    2x2 phase image, including at the zero-padded borders (the pad is even,
    so phases align; ``ops/spacetodepth.py``)."""
    from jax import lax

    from practicaldeepstereo_nips2018_tpu.ops import spacetodepth

    rng = np.random.RandomState(3)
    image = jnp.asarray(rng.randn(2, 16, 20, 3).astype(np.float32))
    weight = jnp.asarray(rng.randn(5, 5, 3, 64).astype(np.float32))

    direct = lax.conv_general_dilated(
        image, weight, window_strides=(2, 2), padding=[(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    phases = spacetodepth.space_to_depth(image)
    embedded = spacetodepth.embed_conv5_kernel(weight)
    via_s2d = lax.conv_general_dilated(
        phases, embedded, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(via_s2d), np.asarray(direct),
                               atol=1e-4)


def test_embedding_s2d_front_matches_plain():
    """The s2d execution flag changes nothing numerically at the embedding
    level (descriptor AND shortcut)."""
    from practicaldeepstereo_nips2018_tpu.models import embedding

    params = embedding.init(jax.random.PRNGKey(0))
    image = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 48, 3)) * 255.0
    descriptor, shortcut = embedding.apply(params, image)
    descriptor_s2d, shortcut_s2d = embedding.apply(params, image,
                                                   s2d_front=True)
    np.testing.assert_allclose(np.asarray(descriptor_s2d),
                               np.asarray(descriptor), atol=2e-4)
    np.testing.assert_allclose(np.asarray(shortcut_s2d),
                               np.asarray(shortcut), atol=2e-4)
