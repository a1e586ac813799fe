"""Torch checkpoint import: structural mapping + numeric block parity.

Builds a synthetic state_dict with the reference's exact key naming and
torch tensor layouts, imports it, and checks (a) the resulting pytree has
exactly the structure of a freshly initialized network with matching shapes,
and (b) a converted conv-block's forward equals the torch computation.
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from practicaldeepstereo_nips2018_tpu import models
from practicaldeepstereo_nips2018_tpu.models import blocks
from practicaldeepstereo_nips2018_tpu.training import torch_import


def _sequential_conv_block(state, prefix, conv):
    state[f"{prefix}.0.weight"] = conv.weight.detach().numpy()
    state[f"{prefix}.0.bias"] = conv.bias.detach().numpy()
    out_features = conv.weight.shape[1] if isinstance(
        conv, (torch.nn.ConvTranspose2d, torch.nn.ConvTranspose3d)) else \
        conv.weight.shape[0]
    state[f"{prefix}.2.weight"] = np.random.RandomState(0).uniform(
        0.5, 1.5, out_features).astype(np.float32)
    state[f"{prefix}.2.bias"] = np.zeros(out_features, np.float32)


def _make_reference_state_dict():
    torch.manual_seed(0)
    state = {}

    def conv_block(prefix, cin, cout, k, dims=2, stride=1):
        cls = torch.nn.Conv2d if dims == 2 else torch.nn.Conv3d
        conv = cls(cin, cout, k, stride=stride,
                   padding=k // 2 if isinstance(k, int) else 1)
        _sequential_conv_block(state, prefix, conv)

    def tconv_block(prefix, cin, cout, k=4, stride=2):
        conv = torch.nn.ConvTranspose3d(cin, cout, k, stride=stride,
                                        padding=1)
        _sequential_conv_block(state, prefix, conv)

    def raw_conv(prefix, cin, cout, k, dims=2):
        cls = torch.nn.Conv2d if dims == 2 else torch.nn.Conv3d
        conv = cls(cin, cout, k, padding=1)
        state[f"{prefix}.weight"] = conv.weight.detach().numpy()
        state[f"{prefix}.bias"] = conv.bias.detach().numpy()

    def residual(prefix, features, dims=2):
        conv_block(f"{prefix}.convolutions.0", features, features, 3, dims)
        conv_block(f"{prefix}.convolutions.1", features, features, 3, dims)

    conv_block("_embedding._embedding_modules.1", 3, 64, 5, stride=2)
    conv_block("_embedding._embedding_modules.2", 64, 64, 5, stride=2)
    residual("_embedding._embedding_modules.3", 64)
    residual("_embedding._embedding_modules.4", 64)
    conv_block("_embedding._shortcut", 64, 8, 3)

    operation = "_matching._operation._matching_operation_modules"
    raw_conv(f"{operation}.0", 128, 64, 3)
    residual(f"{operation}.1", 64)
    residual(f"{operation}.2", 64)
    raw_conv(f"{operation}.3", 64, 8, 3)

    conv_block("_regularization._smoothing", 8, 8, 3, dims=3)
    for index, features in enumerate([8, 16, 32, 64]):
        conv_block(f"_regularization._contraction_blocks.{index}"
                   "._downsampling_2x", features, 2 * features, 3, dims=3,
                   stride=2)
        conv_block(f"_regularization._contraction_blocks.{index}"
                   "._smoothing", 2 * features, 2 * features, 3, dims=3)
    for index, features in enumerate([128, 64, 32, 16]):
        tconv_block(f"_regularization._expansion_blocks.{index}"
                    "._upsampling_2x", features, features // 2)
        conv_block(f"_regularization._expansion_blocks.{index}._smoothing",
                   features // 2, features // 2, 3, dims=3)
    tconv_block("_regularization._upsample_to_halfsize", 8, 4)
    tconv = torch.nn.ConvTranspose3d(4, 1, (3, 4, 4), stride=(1, 2, 2),
                                     padding=(1, 1, 1))
    state["_regularization._upsample_to_fullsize.weight"] = (
        tconv.weight.detach().numpy())
    state["_regularization._upsample_to_fullsize.bias"] = (
        tconv.bias.detach().numpy())
    return state


def test_import_structure_matches_init():
    state = _make_reference_state_dict()
    imported = torch_import.params_from_torch_state_dict(state)
    initialized = models.init(jax.random.PRNGKey(0), models.PDSConfig())

    imported_paths = {
        jax.tree_util.keystr(path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(imported)[0]
    }
    initialized_paths = {
        jax.tree_util.keystr(path): leaf.shape
        for path, leaf in
        jax.tree_util.tree_flatten_with_path(initialized)[0]
    }
    assert imported_paths == initialized_paths


def test_imported_network_runs():
    state = _make_reference_state_dict()
    params = jax.tree.map(jnp.asarray,
                          torch_import.params_from_torch_state_dict(state))
    config = models.PDSConfig(maximum_disparity=63)
    left = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 255
    right = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 255
    disparity = models.infer(params, left, right, config)
    assert disparity.shape == (1, 64, 64)
    assert bool(jnp.all(jnp.isfinite(disparity)))


def test_converted_conv_block_matches_torch():
    torch.manual_seed(3)
    conv = torch.nn.Conv2d(6, 10, 3, padding=1)
    norm = torch.nn.InstanceNorm2d(10, affine=True)
    with torch.no_grad():
        norm.weight.uniform_(0.5, 1.5)
        norm.bias.uniform_(-0.2, 0.2)
    state = {
        "block.0.weight": conv.weight.detach().numpy(),
        "block.0.bias": conv.bias.detach().numpy(),
        "block.2.weight": norm.weight.detach().numpy(),
        "block.2.bias": norm.bias.detach().numpy(),
    }
    params = jax.tree.map(
        jnp.asarray, torch_import._conv_block(state, "block"))
    x = torch.randn(2, 6, 9, 11)
    expected = norm(torch.nn.functional.leaky_relu(
        conv(x), negative_slope=0.1)).detach().numpy()
    got = blocks.conv_block(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert np.allclose(np.asarray(got), np.moveaxis(expected, 1, -1),
                       atol=1e-5)


def test_converted_transposed_block_matches_torch():
    torch.manual_seed(4)
    conv = torch.nn.ConvTranspose3d(6, 3, 4, stride=2, padding=1)
    state = {"up.weight": conv.weight.detach().numpy(),
             "up.bias": conv.bias.detach().numpy()}
    params = jax.tree.map(
        jnp.asarray, torch_import._conv_transpose_nd(state, "up"))
    x = torch.randn(1, 6, 4, 5, 6)
    expected = conv(x).detach().numpy()
    got = blocks.conv_transpose(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1)),
        stride=2, padding=1)
    assert np.allclose(np.asarray(got), np.moveaxis(expected, 1, -1),
                       atol=1e-5)
