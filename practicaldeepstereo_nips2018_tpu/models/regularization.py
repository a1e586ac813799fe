"""Regularization: 3D hourglass network over the cost volume.

Functional re-design of the reference's ``regularization.py:11-126``. The
hourglass consumes the [B, D', H/4, W/4, 8] cost volume plus the left-image
2D shortcut and produces similarity scores for EVEN disparities at full image
resolution.

Structure (feature widths for the default 8-feature config):

    smoothing: 3x3x3 block (8 -> 8)                      (reg.py:77-78,116)
    4 contraction blocks, widths 8/16/32/64              (reg.py:79-82)
        each: stride-2 3x3x3 block f -> 2f ("down"), then 3x3x3 block
        2f -> 2f ("smooth"); returns BOTH outputs (reg.py:11-31)
    4 expansion blocks, widths 128/64/32/16              (reg.py:83-86)
        each: 4x4x4 stride-2 transposed block f -> f/2, add contraction
        skip, 3x3x3 smooth block (reg.py:34-57)
    upsample-to-halfsize: 4x4x4 stride-2 transposed block 8 -> 4
    upsample-to-fullsize: RAW anisotropic transposed conv (3,4,4)
        stride (1,2,2) pad (1,1,1), 4 -> 1 (no act/norm;
        network_blocks.py:37-44) -> squeeze   (reg.py:87-92,125-126)

Two load-bearing details, both reproduced exactly:

* The left-image shortcut (depth-1 volume) is broadcast-added along the
  disparity axis to the input of EVERY contraction: the loop state carries a
  ``shortcut`` tensor that starts as the 2D left shortcut and becomes the
  pre-smooth downsampling output at deeper levels (reference
  ``regularization.py:114-119``).
* Skip connections store the SMOOTHED outputs before each contraction and are
  added after each expansion's upsampling (reference
  ``regularization.py:115-123``).

Output layout: [B, H, W, (D+1)/2] — disparity LAST (lane dimension), ready
for the softmax/argmax of the estimator and loss. The reference returns
[B, (D+1)/2, H, W].

TPU layout note — the final two stages run in DEPTH-FOLDED layout. The
upsamplers shrink channels to 4 and then 1; a [.., H, W, 1] tensor on TPU
pads its minor dimension to the 128-wide lane tile, a 128x memory blowup
that OOMs at full resolution (observed: a 27 GB conv intermediate for a
212 MB logical tensor). Instead the volume is reshaped to
[B, H, W, D*C] — depth folded into the lane dimension (D*C = 384+ lanes,
perfectly tiled) — and each 3D transposed conv is decomposed exactly into
its depth taps: per tap, a GROUPED spatial 2D transposed conv
(``feature_group_count`` = depth levels, kernel shared across depths) plus a
zero-padded shift along the folded depth blocks. Outputs interleave depth
parities for the stride-2 depth upsampling. The decomposition is exact
(validated against the dense ``conv_transpose`` in tests) and leaves the
result directly in disparity-last [B, H, W, D] form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from practicaldeepstereo_nips2018_tpu.models import blocks

NUMBER_OF_SCALES = 4
_CONTRACTION_WIDTH_SCALES = (1, 2, 4, 8)
_EXPANSION_WIDTH_SCALES = (16, 8, 4, 2)


def init(key, number_of_features: int = 8, dtype=jnp.float32) -> dict:
    """Returns the hourglass parameter pytree."""
    keys = jax.random.split(key, 2 * NUMBER_OF_SCALES * 2 + 3)
    key_iterator = iter(keys)
    params = {
        "smoothing": blocks.init_conv_block(
            next(key_iterator), 3, number_of_features, number_of_features,
            spatial_dims=3, dtype=dtype),
    }
    for index, scale in enumerate(_CONTRACTION_WIDTH_SCALES):
        features = number_of_features * scale
        params[f"contraction{index + 1}"] = {
            "down": blocks.init_conv_block(
                next(key_iterator), 3, features, 2 * features,
                spatial_dims=3, dtype=dtype),
            "smooth": blocks.init_conv_block(
                next(key_iterator), 3, 2 * features, 2 * features,
                spatial_dims=3, dtype=dtype),
        }
    for index, scale in enumerate(_EXPANSION_WIDTH_SCALES):
        features = number_of_features * scale
        params[f"expansion{index + 1}"] = {
            "up": blocks.init_conv_transpose_block(
                next(key_iterator), 4, features, features // 2,
                spatial_dims=3, dtype=dtype),
            "smooth": blocks.init_conv_block(
                next(key_iterator), 3, features // 2, features // 2,
                spatial_dims=3, dtype=dtype),
        }
    params["upsample_to_halfsize"] = blocks.init_conv_transpose_block(
        next(key_iterator), 4, number_of_features, number_of_features // 2,
        spatial_dims=3, dtype=dtype)
    params["upsample_to_fullsize"] = blocks.init_conv_transpose(
        next(key_iterator), (3, 4, 4), number_of_features // 2, 1,
        spatial_dims=3, dtype=dtype)
    return params


def contraction_block(params: dict, x: jnp.ndarray):
    """Stride-2 downsampling + smoothing; returns (pre_smooth, smoothed)."""
    down = blocks.conv_block(params["down"], x, stride=2)
    return down, blocks.conv_block(params["smooth"], down)


def expansion_block(params: dict, x: jnp.ndarray,
                    shortcut_from_contraction: jnp.ndarray) -> jnp.ndarray:
    """Transposed upsampling, skip add, smoothing."""
    up = blocks.conv_transpose_block(params["up"], x, stride=2, padding=1)
    return blocks.conv_block(params["smooth"],
                             up + shortcut_from_contraction)


# ---------------------------------------------------------------------------
# Depth-folded upsampling stages (see module docstring)
# ---------------------------------------------------------------------------


def _spatial_transpose_dense(folded: jnp.ndarray,
                             kernel_2d: jnp.ndarray) -> jnp.ndarray:
    """Spatial 4x4 stride-2 transposed conv over folded channels."""
    return lax.conv_general_dilated(
        folded, kernel_2d.astype(folded.dtype), window_strides=(1, 1),
        padding=[(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.promote_types(folded.dtype, jnp.float32),
    ).astype(folded.dtype)


def _banded_depth_kernel(weight: jnp.ndarray, depth_in: int, depth_out: int,
                         depth_stride: int, depth_pad: int) -> jnp.ndarray:
    """Builds a dense 2D kernel encoding the banded depth mixing of a 3D
    transposed conv over folded channels.

    In the gather convention (input depth-dilated by ``depth_stride``, padded
    ``kd - 1 - depth_pad``), output depth ``o`` draws input depth ``i``
    through depth tap ``j = depth_stride*i - o + (kd - 1 - depth_pad)`` when
    ``0 <= j < kd``. All other (i, o) pairs are zero — the FLOP waste of the
    dense form is acceptable because these layers are a tiny fraction of the
    network's compute, while the dense 384-wide channel dim keeps TPU lane
    tiling exact (the per-depth grouped form materializes pathological
    [..., D, 1] layouts that OOM at full resolution).

    Args:
        weight: [kd, kh, kw, cin, cout] 3D transposed kernel (gather order).
    Returns:
        [kh, kw, depth_in * cin, depth_out * cout] dense spatial kernel.
    """
    kd, kh, kw, cin, cout = weight.shape
    i_index = jnp.arange(depth_in)[:, None]
    o_index = jnp.arange(depth_out)[None, :]
    j = depth_stride * i_index - o_index + (kd - 1 - depth_pad)
    valid = (j >= 0) & (j < kd)
    taps = weight[jnp.clip(j, 0, kd - 1)]  # [Din, Dout, kh, kw, cin, cout]
    taps = jnp.where(valid[..., None, None, None, None], taps, 0.0)
    # -> [kh, kw, Din, cin, Dout, cout] -> [kh, kw, Din*cin, Dout*cout]
    taps = jnp.transpose(taps, (2, 3, 0, 4, 1, 5))
    return taps.reshape(kh, kw, depth_in * cin, depth_out * cout)


def _upsample_to_halfsize_folded(params: dict, volume: jnp.ndarray
                                 ) -> jnp.ndarray:
    """4x4x4 stride-2 transposed conv block (C->C/2) in depth-folded layout.

    Input [B, D, H, W, C]; output folded [B, 2H, 2W, 2D*(C/2)]. Exactly
    equals ``blocks.conv_transpose_block(..., stride=2, padding=1)``.
    """
    weight = params["conv"]["w"]  # [4, 4, 4, C, C/2]
    bias = params["conv"]["b"]
    batch, depth, height, width, channels = volume.shape
    out_channels = weight.shape[-1]
    folded = jnp.moveaxis(volume, 1, 3).reshape(batch, height, width,
                                                depth * channels)
    kernel = _banded_depth_kernel(weight, depth, 2 * depth,
                                  depth_stride=2, depth_pad=1)
    out = _spatial_transpose_dense(folded, kernel)
    out = out + jnp.tile(bias, (2 * depth,)).astype(out.dtype)
    # LeakyReLU + instance norm (stats per (sample, channel) over D, H, W).
    out = blocks.leaky_relu(out)
    five_d = out.reshape(batch, 2 * height, 2 * width, 2 * depth,
                         out_channels)
    mean = jnp.mean(five_d, axis=(1, 2, 3), keepdims=True)
    centered = five_d - mean
    variance = jnp.mean(jnp.square(centered), axis=(1, 2, 3), keepdims=True)
    normalized = centered * lax.rsqrt(variance + blocks.INSTANCE_NORM_EPS)
    normalized = (normalized * params["norm"]["scale"] +
                  params["norm"]["bias"])
    return normalized.reshape(batch, 2 * height, 2 * width,
                              2 * depth * out_channels).astype(folded.dtype)


def _upsample_to_fullsize_folded(params: dict, folded: jnp.ndarray,
                                 depth_levels: int) -> jnp.ndarray:
    """Raw anisotropic (3,4,4)/(1,2,2) transposed conv (C->1) in folded
    layout: [B, H, W, D*C] -> disparity-last similarities [B, 2H, 2W, D]."""
    weight = params["w"]  # [3, 4, 4, C, 1]
    bias = params["b"]
    kernel = _banded_depth_kernel(weight, depth_levels, depth_levels,
                                  depth_stride=1, depth_pad=1)
    out = _spatial_transpose_dense(folded, kernel)
    return out + bias.astype(out.dtype)


def apply(params: dict,
          matching_signatures: jnp.ndarray,
          shortcut_from_left_image: jnp.ndarray,
          remat: bool = False) -> jnp.ndarray:
    """Returns regularized similarities for even disparities.

    Args:
        matching_signatures: [B, D', H/4, W/4, C] cost volume (D' = disparity
            levels at quarter resolution).
        shortcut_from_left_image: [B, H/4, W/4, C] left descriptor shortcut.

    Returns:
        [B, H, W, 2*D'] similarities — element d along the last axis scores
        disparity ``2*d`` pixels (the network upsamples disparity 2x from
        quarter resolution, spatial 4x; reference ``regularization.py:60-72``).
    """
    contraction_fn = contraction_block
    expansion_fn = expansion_block
    halfsize_fn = _upsample_to_halfsize_folded
    if remat:
        contraction_fn = jax.checkpoint(contraction_block)
        expansion_fn = jax.checkpoint(expansion_block)
        halfsize_fn = jax.checkpoint(_upsample_to_halfsize_folded)

    # Depth-1 volume broadcast along disparities at each contraction input.
    shortcut = shortcut_from_left_image[:, None]
    output = blocks.conv_block(params["smoothing"], matching_signatures)

    shortcuts_from_contraction = []
    for index in range(NUMBER_OF_SCALES):
        shortcuts_from_contraction.append(output)
        shortcut, output = contraction_fn(
            params[f"contraction{index + 1}"], shortcut + output)

    for index in range(NUMBER_OF_SCALES):
        output = expansion_fn(params[f"expansion{index + 1}"], output,
                              shortcuts_from_contraction.pop())

    # Final upsampling runs depth-folded (see module docstring) and lands
    # directly in disparity-last [B, H, W, 2D'] layout.
    depth_levels = 2 * output.shape[1]
    folded = halfsize_fn(params["upsample_to_halfsize"], output)
    return _upsample_to_fullsize_folded(params["upsample_to_fullsize"],
                                        folded, depth_levels)
