"""Depth-folded 3D convolutions: the TPU-native cost-volume conv layer.

Motivation. The hourglass regularization network convolves 5-D cost volumes
whose channel counts are tiny (8..128, and 4/1 in the upsamplers). On TPU
the minor-most dimension is tiled to 128 lanes, so NDHWC tensors with C=8
waste 16x memory bandwidth — and C=1 intermediates explode 128x (a 27 GB
buffer at full resolution, measured). Benchmarked end-to-end, the NDHWC
hourglass dominates the forward pass.

Design. Fold the disparity (depth) axis into the lane dimension:

    [B, D, H, W, C]  ->  [B, H, W, D*C]

``D*C`` is ~constant across hourglass levels (each contraction halves D and
doubles C), 384 lanes for the default D'=48 — perfectly tiled. Every 3-D
convolution then becomes ONE dense 2-D spatial convolution whose channel
matrix encodes the banded depth mixing: output depth block ``o`` draws input
depth block ``i`` through depth tap ``j`` with

    forward conv:       j = i - stride*o + pad            (0 <= j < kd)
    transposed conv:    j = stride*i - o + (kd-1-pad)     (0 <= j < kd)

(the transposed relation is the gather convention of
``models/blocks.py::conv_transpose``: input depth-dilated by ``stride``,
padded ``kd-1-pad``). All other (i, o) pairs are zero. The dense form wastes
~D/kd of the MACs on structural zeros, but the dense 384x384 channel matmul
runs at full MXU utilization — measured, it beats the lane-padded NDHWC
form by an order of magnitude.

Why the structural zeros are NOT reclaimed by a block-banded kernel
(investigated on hardware, round 2):

* XLA:TPU already skips the SPATIAL dilation zeros of the transposed convs
  (``scripts/microbench_transpose.py``: the lhs_dilated form beats a
  hand-phased decomposition 1.6x and its timing implies ~87% MFU counting
  only non-dilated taps) — the naive 16-taps-per-output worry is moot.
* The remaining waste is the dense DEPTH band: useful contraction width is
  ``kd * cin`` = 24 lanes (48 in the upsamplers) against the MXU's 128-lane
  tile. Any banded/batched-small-matmul formulation caps the contraction at
  those 24-48 lanes, i.e. <= 19-38% MXU issue width — bounding the best
  possible win at ~2-3x on these layers. Splitting the depth axis into
  halo'd lane-groups of 128 reaches that bound only for D*cin >> 128; at
  this network's 384 lanes there are 3 groups with a 3-group band — zero
  reduction (measured arithmetic identity, not an implementation gap).
* The hourglass tensors are small (~33 MB per level): group-gather/relayout
  traffic of a banded decomposition costs about what the skipped MACs save
  at HBM speed. The measured hourglass is ~7 ms of a ~20 ms forward; its
  executed-MAC MFU is already near the chip roofline (``utils/flops.py``
  separates useful vs executed MACs so the overhead stays auditable in
  every bench artifact).

Instance norm in folded layout normalizes per (sample, channel) over
(D, H, W) — bit-equal to the NDHWC form.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from practicaldeepstereo_nips2018_tpu.models import blocks


def fold(volume: jnp.ndarray) -> jnp.ndarray:
    """[B, D, H, W, C] -> [B, H, W, D*C]."""
    batch, depth, height, width, channels = volume.shape
    return jnp.moveaxis(volume, 1, 3).reshape(batch, height, width,
                                              depth * channels)


def unfold(folded: jnp.ndarray, depth: int) -> jnp.ndarray:
    """[B, H, W, D*C] -> [B, D, H, W, C]."""
    batch, height, width, merged = folded.shape
    channels = merged // depth
    return jnp.moveaxis(
        folded.reshape(batch, height, width, depth, channels), 3, 1)


def banded_kernel(weight: jnp.ndarray, depth_in: int, depth_out: int,
                  depth_stride: int, depth_pad: int,
                  transposed: bool) -> jnp.ndarray:
    """Dense [kh, kw, Din*cin, Dout*cout] kernel with banded depth mixing.

    Args:
        weight: [kd, kh, kw, cin, cout] 3-D kernel (gather order).
    """
    kd, kh, kw, cin, cout = weight.shape
    i_index = jnp.arange(depth_in)[:, None]
    o_index = jnp.arange(depth_out)[None, :]
    if transposed:
        j = depth_stride * i_index - o_index + (kd - 1 - depth_pad)
    else:
        j = i_index - depth_stride * o_index + depth_pad
    valid = (j >= 0) & (j < kd)
    taps = weight[jnp.clip(j, 0, kd - 1)]  # [Din, Dout, kh, kw, cin, cout]
    taps = jnp.where(valid[..., None, None, None, None], taps, 0.0)
    taps = jnp.transpose(taps, (2, 3, 0, 4, 1, 5))
    return taps.reshape(kh, kw, depth_in * cin, depth_out * cout)


def conv3d_folded(params: dict, folded: jnp.ndarray, depth_in: int,
                  stride: int = 1) -> tuple[jnp.ndarray, int]:
    """3x3x3 convolution (pad 1) on a depth-folded tensor.

    Args:
        params: {'w': [3, 3, 3, cin, cout], 'b': [cout]}.
        folded: [B, H, W, depth_in * cin].
    Returns:
        ([B, H', W', depth_out * cout], depth_out); spatial/depth follow the
        torch shape rule ``floor((n + 2 - 3)/stride) + 1``.
    """
    weight = params["w"]
    depth_out = (depth_in + 2 - weight.shape[0]) // stride + 1
    kernel = banded_kernel(weight, depth_in, depth_out, stride, 1,
                           transposed=False)
    # No ``preferred_element_type``: f32-output convs of bf16 operands make
    # the kernel-gradient conv mixed-dtype (rejected by lax); the MXU
    # accumulates in f32 either way (see ``models/blocks.py::conv``).
    out = lax.conv_general_dilated(
        folded, kernel.astype(folded.dtype), window_strides=(stride, stride),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = out + jnp.tile(params["b"], (depth_out,)).astype(out.dtype)
    return out, depth_out


def conv_transpose3d_folded(params: dict, folded: jnp.ndarray,
                            depth_in: int, kernel_size: int = 4,
                            stride: int = 2,
                            padding: int = 1) -> tuple[jnp.ndarray, int]:
    """Transposed 3-D conv (isotropic kernel/stride) on a folded tensor.

    Output depth/size follow the torch rule ``(n-1)*s - 2p + k``.
    """
    weight = params["w"]
    depth_out = (depth_in - 1) * stride - 2 * padding + weight.shape[0]
    kernel = banded_kernel(weight, depth_in, depth_out, stride, padding,
                           transposed=True)
    spatial_pad = kernel_size - 1 - padding
    out = lax.conv_general_dilated(
        folded, kernel.astype(folded.dtype), window_strides=(1, 1),
        padding=[(spatial_pad, spatial_pad)] * 2, lhs_dilation=(stride,
                                                                stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = out + jnp.tile(params["b"], (depth_out,)).astype(out.dtype)
    return out, depth_out


def instance_norm_folded(folded: jnp.ndarray, depth: int,
                         params: dict | None = None) -> jnp.ndarray:
    """Affine instance norm: per (sample, channel) moments over (H, W, D).

    Float32 statistics accumulation, single fused pass (see
    ``models/blocks.py::instance_norm`` for the rationale)."""
    batch, height, width, merged = folded.shape
    channels = merged // depth
    statistics_dtype = jnp.promote_types(folded.dtype, jnp.float32)
    five_d = folded.reshape(batch, height, width, depth,
                            channels).astype(statistics_dtype)
    mean = jnp.mean(five_d, axis=(1, 2, 3), keepdims=True)
    variance = jnp.mean(jnp.square(five_d), axis=(1, 2, 3),
                        keepdims=True) - jnp.square(mean)
    scale = lax.rsqrt(variance + blocks.INSTANCE_NORM_EPS)
    offset = -mean * scale
    if params is not None:
        scale = scale * params["scale"]
        offset = offset * params["scale"] + params["bias"]
    normalized = five_d * scale + offset
    return normalized.reshape(batch, height, width, merged).astype(
        folded.dtype)


def conv_block3d_folded(params: dict, folded: jnp.ndarray, depth_in: int,
                        stride: int = 1,
                        impl: str = "dense") -> tuple[jnp.ndarray, int]:
    """Conv -> LeakyReLU(0.1) -> affine InstanceNorm, folded.

    ``impl`` selects the conv execution: ``"dense"`` (full banded channel
    matrix), ``"banded_slab"`` (per-128-lane-group slab convs, ~1/3 fewer
    K-tiles) or ``"banded_pallas"`` (fused slab kernel) — all exact, see
    ``ops/folded_banded.py``.
    """
    depth_out = (depth_in + 2 - params["conv"]["w"].shape[0]) // stride + 1
    # Stride-2 contraction convs measured FASTER dense than slab (0.26 vs
    # 0.37 ms on contraction1, scripts/microbench_folded_banded.py r3): the
    # strided slab convs lower worse than the K-tile saving recovers. The
    # banded impls therefore apply only to the stride-1 smooths (and the
    # transposed upsamplers).
    if impl == "dense" or stride != 1:
        out, _ = conv3d_folded(params["conv"], folded, depth_in, stride)
    else:
        from practicaldeepstereo_nips2018_tpu.ops import folded_banded
        if impl == "banded_pallas":
            out = folded_banded.conv3d_folded_pallas(params["conv"], folded,
                                                     depth_in, stride)
        else:
            out = folded_banded.conv3d_folded_slab(params["conv"], folded,
                                                   depth_in, stride)
    return instance_norm_folded(blocks.leaky_relu(out), depth_out,
                                params["norm"]), depth_out


def conv_transpose_block3d_folded(params: dict, folded: jnp.ndarray,
                                  depth_in: int,
                                  impl: str = "dense"
                                  ) -> tuple[jnp.ndarray, int]:
    """TransposedConv(4, stride 2, pad 1) -> LeakyReLU -> InstanceNorm."""
    if impl == "dense":
        out, depth_out = conv_transpose3d_folded(params["conv"], folded,
                                                 depth_in)
    else:
        from practicaldeepstereo_nips2018_tpu.ops import folded_banded
        depth_out = (depth_in - 1) * 2 - 2 + params["conv"]["w"].shape[0]
        out = folded_banded.conv_transpose3d_folded_slab(params["conv"],
                                                         folded, depth_in)
    return instance_norm_folded(blocks.leaky_relu(out), depth_out,
                                params["norm"]), depth_out


def anisotropic_fullsize_transpose(params: dict, folded: jnp.ndarray,
                                   depth: int) -> jnp.ndarray:
    """The raw final upsampler: transposed conv kernel (3, 4, 4), stride
    (1, 2, 2), padding (1, 1, 1), C -> 1 (reference
    ``network_blocks.py:37-44``), folded: [B, H, W, D*C] -> disparity-last
    similarities [B, 2H, 2W, D]."""
    weight = params["w"]  # [3, 4, 4, C, 1]
    kernel = banded_kernel(weight, depth, depth, depth_stride=1, depth_pad=1,
                           transposed=True)
    out = lax.conv_general_dilated(
        folded, kernel.astype(folded.dtype), window_strides=(1, 1),
        padding=[(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + params["b"].astype(out.dtype)


def broadcast_shortcut(shortcut: jnp.ndarray, depth: int) -> jnp.ndarray:
    """[B, H, W, C] left-image shortcut -> folded [B, H, W, D*C] (the
    reference broadcasts the depth-1 shortcut along the disparity axis,
    ``regularization.py:114-119``)."""
    return jnp.tile(shortcut, (1, 1, 1, depth))
