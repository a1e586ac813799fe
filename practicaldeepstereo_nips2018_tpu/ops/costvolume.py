"""Cost-volume construction: linearity-factored shift-and-concat matching.

The reference builds its concatenation cost volume with a Python loop over
disparities (reference ``matching.py:52-63``): for each ``d`` it zero-shifts
the right descriptor by ``d`` columns, concatenates with the left descriptor
into a 128-channel map, and runs the first 3x3 conv of the matching head on
it. That is ``D`` full 128-in-channel convolutions — the #1 hot loop.

TPU-first observation: convolution is linear, so the 128-in conv of the
concatenated pair splits exactly into

    conv_128(concat(L, shift_d(R))) = conv_L(L) + conv_R(shift_d(R))

where ``conv_L`` / ``conv_R`` use the first / last 64 input-channel slices of
the same kernel. Further, because the reference's shift fills with zeros and
its conv zero-pads the borders, ``conv_R(shift_d(R))`` is itself just a
column-shift of a single *widened* convolution of ``R``:

    conv_R(shift_d(R))[x] = W[x - d + 1]   for 0 <= x - d + 1 <= width,
                            0              otherwise,

with ``W = conv_R(R)`` evaluated at output positions ``-1 .. width-1`` (one
extra column on the left — the ``x = d - 1`` window straddles the zero fill
and sees column 0 of ``R`` through the kernel's right tap). Proof sketch: for
``x >= d`` the shifted input around ``x`` equals the original input around
``x - d`` including the implicit zero padding; for ``x <= d - 2`` the whole
window is zero fill.

One boundary needs an exact correction: the reference's shift also TRUNCATES
the last ``d`` columns of ``R`` (``matching.py:56-58`` slices ``...:-d``), so
at the rightmost output ``x = width-1`` the reference conv sees zero padding
where the precomputed plane sees the real column ``R[width-d]``. The fix is a
second, 1-column-wide convolution ``E = conv(R, w_right[:, rightmost tap])``
— ``E[j]`` is exactly the spurious contribution of column ``R[j]`` — which is
subtracted at the seam. Only the single rightmost column per disparity is
affected (a 3-wide kernel overhangs by at most one column).

So the entire disparity loop collapses to TWO 64-in-channel convolutions (plus
a width-1 edge conv) and ``D`` column-shifted adds (pure data movement that
XLA fuses) — a ~``D``-fold FLOP reduction on the head conv with bit-exact (up
to float addition order) reference semantics. The per-disparity residual tail
of the matching head then runs disparity-*batched* on the MXU (see
``models/matching.py``).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from practicaldeepstereo_nips2018_tpu.models import blocks


def matching_head_planes(head_conv_params: dict,
                         left_descriptor: jnp.ndarray,
                         right_descriptor: jnp.ndarray):
    """Computes the two factored conv planes of the matching head.

    Args:
        head_conv_params: raw 3x3 conv params {'w': [3, 3, 128, 64], 'b'}
            (the first conv of the reference's MatchingOperation,
            ``matching.py:81-83`` / ``network_blocks.py:19-24``).
        left_descriptor, right_descriptor: [B, H, W, 64] embeddings.

    Returns:
        (left_plane [B, H, W, 64], right_plane_wide [B, H, W+1, 64]) where
        ``right_plane_wide[:, :, j]`` is the right-half conv output at
        column ``j - 1``.
    """
    w = head_conv_params["w"]
    features = left_descriptor.shape[-1]
    w_left = w[:, :, :features, :]
    w_right = w[:, :, features:, :]
    # No ``preferred_element_type`` on any conv: see
    # ``models/blocks.py::conv`` (f32-output convs of bf16 operands break
    # the kernel-gradient convolution; the MXU accumulates in f32 anyway).

    left_plane = lax.conv_general_dilated(
        left_descriptor, w_left.astype(left_descriptor.dtype),
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    left_plane = (left_plane + head_conv_params["b"]).astype(
        left_descriptor.dtype)

    # One extra output column on the LEFT (position x = -1): pad W by (2, 1).
    right_plane_wide = lax.conv_general_dilated(
        right_descriptor, w_right.astype(right_descriptor.dtype),
        window_strides=(1, 1), padding=[(1, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # Right-edge correction plane: contribution of a single input column
    # through the kernel's rightmost tap, E[j] = sum_ky w[ky, -1] R[., j].
    right_tap = w_right[:, -1:, :, :]
    edge_plane = lax.conv_general_dilated(
        right_descriptor, right_tap.astype(right_descriptor.dtype),
        window_strides=(1, 1), padding=[(1, 1), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return left_plane, right_plane_wide, edge_plane


def shift_accumulate_volume(left_plane: jnp.ndarray,
                            right_plane_wide: jnp.ndarray,
                            edge_plane: jnp.ndarray,
                            maximum_disparity: int) -> jnp.ndarray:
    """Assembles the per-disparity head-conv outputs from the factored planes.

    Args:
        left_plane: [B, H, W, C] left-half conv output (bias included).
        right_plane_wide: [B, H, W+1, C] right-half conv output, one extra
            left column (see :func:`matching_head_planes`).
        edge_plane: [B, H, W, C] rightmost-tap correction plane.
        maximum_disparity: largest disparity index D (inclusive); the volume
            covers d = 0 .. D.

    Returns:
        [B, D+1, H, W, C] cost volume equal to the reference's per-disparity
        ``conv(concat(left, shift_d(right)))`` outputs (``matching.py:52-63``).
    """
    width = left_plane.shape[-2]
    # Prepend D zero columns so that every disparity's contribution is a
    # static W-wide slice: volume[d][x] = padded[x + D - d + 1]
    # = right_plane_wide[x - d + 1] (zero fill where x <= d - 2).
    padded = jnp.pad(right_plane_wide,
                     [(0, 0), (0, 0), (maximum_disparity, 0), (0, 0)])
    shifted = [
        lax.slice_in_dim(padded, maximum_disparity - d + 1,
                         maximum_disparity - d + 1 + width, axis=2)
        for d in range(maximum_disparity + 1)
    ]
    volume = jnp.stack(shifted, axis=1)  # [B, D+1, H, W, C]

    # Rightmost column: the reference's shift truncates R's last d columns,
    # so the x = width-1 window must NOT see R[width-d]. Subtracting the
    # rightmost-tap contribution reproduces the truncated-conv value exactly
    # (and yields 0 at d >= width, where the shifted input is all zero fill).
    # The fix is applied as a width-padded ADD of a per-disparity correction
    # column — an elementwise op XLA fuses into the stack, unlike a
    # slice+concat which forces a full-volume layout copy (profiled).
    corrections = []
    for d in range(maximum_disparity + 1):
        if 1 <= d <= width:
            corrections.append(-edge_plane[:, :, width - d, :])
        else:
            corrections.append(jnp.zeros_like(left_plane[:, :, 0, :]))
    correction = jnp.stack(corrections, axis=1)  # [B, D+1, H, C]
    volume = volume + jnp.pad(
        correction[:, :, :, None, :],
        [(0, 0), (0, 0), (0, 0), (width - 1, 0), (0, 0)])
    return volume + left_plane[:, None]


def build_cost_volume(head_conv_params: dict,
                      left_descriptor: jnp.ndarray,
                      right_descriptor: jnp.ndarray,
                      maximum_disparity: int) -> jnp.ndarray:
    """Factored cost-volume build: planes + shift-accumulate in one call."""
    left_plane, right_plane_wide, edge_plane = matching_head_planes(
        head_conv_params, left_descriptor, right_descriptor)
    return shift_accumulate_volume(left_plane, right_plane_wide, edge_plane,
                                   maximum_disparity)


def shift_accumulate_volume_paired(left_plane: jnp.ndarray,
                                   right_plane_wide: jnp.ndarray,
                                   edge_plane: jnp.ndarray,
                                   maximum_disparity: int) -> jnp.ndarray:
    """Disparity-PAIRED layout of :func:`shift_accumulate_volume`.

    Returns [B, (D+1)/2, H, W, 2C]: adjacent disparities (2p, 2p+1) are
    concatenated along the channel axis. Rationale (measured): the matching
    tail runs disparity-batched convolutions with C=64 channels — bf16 lane
    tiling pads 64 to 128, wasting half the HBM traffic of the ~200 MB
    volume AND half the MXU columns (N=64). Pairing gives full 128-lane
    tensors; the tail's block-diagonal kernels then trade 2x structural-zero
    MACs for 2x MXU width (a wash) while HALVING every memory pass — the
    tail is HBM-bound on its instance-norm passes, so this is the win.
    ``(D+1)`` must be even (always true for valid network configs:
    (max_disparity+1)/4 is a multiple of 16).
    """
    if (maximum_disparity + 1) % 2:
        raise ValueError("paired volume needs an even disparity count")
    width = left_plane.shape[-2]
    padded = jnp.pad(right_plane_wide,
                     [(0, 0), (0, 0), (maximum_disparity, 0), (0, 0)])

    def shifted(d):
        return lax.slice_in_dim(padded, maximum_disparity - d + 1,
                                maximum_disparity - d + 1 + width, axis=2)

    def correction_column(d):
        if 1 <= d <= width:
            return -edge_plane[:, :, width - d, :]
        return jnp.zeros_like(left_plane[:, :, 0, :])

    pairs = [
        jnp.concatenate([shifted(2 * p), shifted(2 * p + 1)], axis=-1)
        for p in range((maximum_disparity + 1) // 2)
    ]
    volume = jnp.stack(pairs, axis=1)  # [B, P, H, W, 2C]

    corrections = jnp.stack([
        jnp.concatenate([correction_column(2 * p),
                         correction_column(2 * p + 1)], axis=-1)
        for p in range((maximum_disparity + 1) // 2)
    ], axis=1)  # [B, P, H, 2C]
    volume = volume + jnp.pad(
        corrections[:, :, :, None, :],
        [(0, 0), (0, 0), (0, 0), (width - 1, 0), (0, 0)])
    left_pair = jnp.concatenate([left_plane, left_plane], axis=-1)
    return volume + left_pair[:, None]


def build_cost_volume_paired(head_conv_params: dict,
                             left_descriptor: jnp.ndarray,
                             right_descriptor: jnp.ndarray,
                             maximum_disparity: int) -> jnp.ndarray:
    """Factored build directly in the disparity-paired layout."""
    left_plane, right_plane_wide, edge_plane = matching_head_planes(
        head_conv_params, left_descriptor, right_descriptor)
    return shift_accumulate_volume_paired(left_plane, right_plane_wide,
                                          edge_plane, maximum_disparity)


def cost_volume_direct(head_conv_params: dict,
                       left_descriptor: jnp.ndarray,
                       right_descriptor: jnp.ndarray,
                       maximum_disparity: int) -> jnp.ndarray:
    """Naive direct-loop cost volume, used only to cross-check the factored
    build in tests (mirrors reference ``matching.py:50-63`` semantics:
    zero-pad right by D columns on the left, slice a W window per disparity,
    concatenate with left, convolve)."""
    padded = jnp.pad(right_descriptor,
                     [(0, 0), (0, 0), (maximum_disparity, 0), (0, 0)])
    width = left_descriptor.shape[-2]
    slices = []
    for d in range(maximum_disparity + 1):
        shifted = lax.slice_in_dim(padded, maximum_disparity - d,
                                   maximum_disparity - d + width, axis=2)
        concatenated = jnp.concatenate([left_descriptor, shifted], axis=-1)
        slices.append(blocks.conv(head_conv_params, concatenated))
    return jnp.stack(slices, axis=1)
