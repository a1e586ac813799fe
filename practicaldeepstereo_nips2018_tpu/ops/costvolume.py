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


# ---------------------------------------------------------------------------
# Deep factoring: the FIRST tail conv is linear in the volume, so it factors
# through the shift-assembly exactly like the head conv did
# ---------------------------------------------------------------------------


def conv1_volume_planes(conv1_params: dict,
                        left_plane: jnp.ndarray,
                        right_plane_wide: jnp.ndarray,
                        edge_plane: jnp.ndarray):
    """Factored planes of ``conv1(volume)`` — conv1 being the first conv of
    the matching tail's residual block 1, the first operation applied to the
    cost volume and the last LINEAR point of the pipeline (everything after
    passes through LeakyReLU).

    Linearity one level deeper: with ``v_d = L + S_d`` (left plane plus the
    zero-fill-shifted right plane, :func:`shift_accumulate_volume`),

        conv1(v_d) = conv1(L) + conv1(S_d) + b1

    and ``conv1(S_d)`` is again a column shift of ONE fixed convolution
    ``t_r = conv1(P)`` of the wide right plane ``P`` (support -1..W-1),
    evaluated on 2 extra left columns (output positions -2..W-1: the
    windows of ``x = d-2`` and ``x = d-1`` straddle the zero fill and reach
    ``P[-1]``), plus two exact boundary corrections:

    * the head-level truncation correction column ``c_d = -E[W-d]`` sits at
      column W-1 of ``v_d``; conv1 smears it into columns W-2..W-1 through
      its column taps (the W tap falls outside) — closed form from the
      edge plane;
    * conv1's own right seam: at ``x = W-1`` the true conv sees zero
      padding beyond W-1 while ``t_r`` saw the real ``P[W-d]`` through its
      rightmost tap — subtract a second edge plane ``E2 = conv1_right_tap(P)``
      (exactly the head's edge-correction construction, one level deeper).

    This replaces the 48-disparity-batched conv1 (the largest single conv
    of the tail, ~122 GMac executed paired at the benchmark shape) with two
    64-channel plane convs plus shifted adds.

    Returns:
        (t_left [B, H, W, C1], t_right_wide [B, H, W+2, C1],
         smear_w2 [B, H, D?..], ...) — see :func:`assemble_conv1_volume_paired`
         for consumption; C1 = conv1's output features.
    """
    w1, b1 = conv1_params["w"], conv1_params["b"]
    dtype = left_plane.dtype

    # conv1 of the left plane (no bias here; b1 added once at assembly).
    t_left = lax.conv_general_dilated(
        left_plane, w1.astype(dtype), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # conv1 of the wide right plane, with TWO extra left output columns
    # (positions -2..W-1 of the plane's own coordinate system; P[-1] is the
    # plane's first stored column, zeros before it).
    t_right_wide = lax.conv_general_dilated(
        right_plane_wide, w1.astype(dtype), window_strides=(1, 1),
        padding=[(1, 1), (2, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # conv1's own right-seam edge plane over P: contribution of one column
    # of P through conv1's rightmost column tap.
    right_tap = w1[:, -1:, :, :]
    edge2_plane = lax.conv_general_dilated(
        right_plane_wide, right_tap.astype(dtype), window_strides=(1, 1),
        padding=[(1, 1), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # Column-tap images of the head edge plane: smear[k][., j] is the
    # contribution of correction value E[j] through conv1 column tap k
    # (k = 0 left, 1 center, 2 right), i.e. a 1-column conv with the
    # H-taps of w1 column k.
    smears = []
    for k in range(w1.shape[1]):
        tap = w1[:, k:k + 1, :, :]
        smears.append(lax.conv_general_dilated(
            edge_plane, tap.astype(dtype), window_strides=(1, 1),
            padding=[(1, 1), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")))

    # d=0 left seam: at x=0 the true conv pads v_0[-1]=0, but the wide
    # plane supplies P[-1] through conv1's LEFT tap — subtract its
    # contribution (only d=0 reaches P[-1] at a padded position).
    left_tap = w1[:, 0:1, :, :]
    left_seam = lax.conv_general_dilated(
        right_plane_wide[:, :, 0:1, :], left_tap.astype(dtype),
        window_strides=(1, 1), padding=[(1, 1), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [B, H, 1, C1]
    return t_left, t_right_wide, edge2_plane, smears, left_seam, b1


def assemble_conv1_volume_paired(planes, maximum_disparity: int,
                                 width: int) -> jnp.ndarray:
    """Assembles ``conv1(volume)`` in the disparity-PAIRED layout from
    :func:`conv1_volume_planes` outputs. Exact (pinned against conv1 of the
    direct volume in tests, including D >= width).

    Derivation of the pieces (x = output column, d = disparity):
    ``conv1(v_d)[x] = t_left[x] + T[x-d] + b1 + corrections`` with
    ``T[u] = t_right_wide`` at stored column ``u+2`` (zero outside), and
    corrections:

    * x=W-1, 1<=d<=W+1: subtract ``edge2[W-d+1]`` (conv1's right seam saw
      the real plane column where the true conv pads zero);
    * x=W-2 / W-1, 1<=d<=W: subtract ``smears[2][W-d]`` / ``smears[1][W-d]``
      (conv1 smearing the head's truncation correction at column W-1; the
      k=0 tap lands outside the image);
    * x=0, d=0 only: subtract the ``left_seam`` column (the wide plane's
      P[-1] leaks through conv1's left tap where the true conv pads zero).
    """
    t_left, t_right_wide, edge2_plane, smears, left_seam, b1 = planes
    padded = jnp.pad(t_right_wide,
                     [(0, 0), (0, 0), (maximum_disparity, 0), (0, 0)])

    def shifted(d):
        start = maximum_disparity - d + 2
        return lax.slice_in_dim(padded, start, start + width, axis=2)

    zero = jnp.zeros_like(t_left[:, :, 0, :])

    def right_corrections(d):
        """[B, H, 2, C1]: corrections for columns W-2 and W-1."""
        if 1 <= d <= width:
            c_w2 = -smears[2][:, :, width - d, :]
            c_w1 = -smears[1][:, :, width - d, :]
        else:
            c_w2 = c_w1 = zero
        if 1 <= d <= width + 1:
            c_w1 = c_w1 - edge2_plane[:, :, width - d + 1, :]
        return jnp.stack([c_w2, c_w1], axis=2)

    pairs = [
        jnp.concatenate([shifted(2 * p), shifted(2 * p + 1)], axis=-1)
        for p in range((maximum_disparity + 1) // 2)
    ]
    volume = jnp.stack(pairs, axis=1)  # [B, P, H, W, 2C1]

    correction = jnp.stack([
        jnp.concatenate([right_corrections(2 * p),
                         right_corrections(2 * p + 1)], axis=-1)
        for p in range((maximum_disparity + 1) // 2)
    ], axis=1)  # [B, P, H, 2, 2C1]
    volume = volume + jnp.pad(
        correction, [(0, 0), (0, 0), (0, 0), (max(0, width - 2), 0),
                     (0, 0)])[:, :, :, -width:]

    # d=0 left seam at column 0 (first member of pair 0 only).
    channels = t_left.shape[-1]
    left_fix = jnp.pad(
        -left_seam[:, :, :, :],
        [(0, 0), (0, 0), (0, width - 1), (0, channels)])
    volume = volume.at[:, 0].add(left_fix)

    base = t_left + b1.astype(t_left.dtype)
    base_pair = jnp.concatenate([base, base], axis=-1)
    return volume + base_pair[:, None]


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
