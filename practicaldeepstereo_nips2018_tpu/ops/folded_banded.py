"""Depth-BANDED folded 3-D convolutions (slab formulation).

The dense depth-folded conv (``ops/folded3d.py``) executes the full
[Din*cin, Dout*cout] channel matrix although only a kd-tap depth band is
nonzero. This module reclaims part of that waste by computing each 128-lane
OUTPUT GROUP (``128/cout`` depths) from only the input SLAB its band
touches — the group's depths plus a ``kd-1`` halo:

    useful K per group = (group_depths + kd - 1) * cin   (144 lanes at the
    hourglass's 8-channel level)           vs dense K = Din * cin (384)

The MXU contracts lanes in 128-wide tiles, so a 144-lane slab still executes
as 2 K-tiles (256) against the dense form's 3 — the measured ceiling is
1.5x on these layers, exactly the bound derived in ``folded3d.py:29-50``.
Lane alignment is what makes the slab form cheap: with a front lane-pad of
``pad*cin``, group ``g``'s slab starts at lane ``128*g`` for every conv in
the network (``stride * group_depths * cin == 128`` holds at all levels),
and the slab weight matrix is GROUP-INDEPENDENT (the local band offset
``j = i_local - stride*o_local`` does not depend on ``g``).

Two implementations, same math:

* :func:`conv3d_folded_slab` — plain XLA: one spatial conv per output
  group on a lane slice, concatenated. No kernel code, works everywhere.
* :func:`conv3d_folded_pallas` — one fused Pallas kernel: grid over
  (H tiles, output groups), manual HBM->VMEM DMA of the halo'd block,
  9 accumulated K=256 MXU dots, bias fused. Stride 1 only (the stride-2
  contraction convs go through the slab form).

Both are exact (up to dtype accumulation order) drop-ins for
``folded3d.conv3d_folded``; equivalence is pinned by tests on CPU
(interpret mode) and the microbenchmark (``scripts/microbench_folded_banded
.py``) decides per shape which form ships.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from practicaldeepstereo_nips2018_tpu.ops import folded3d


def _group_layout(depth_in: int, depth_out: int, cin: int, cout: int,
                  stride: int, kd: int, pad: int):
    """Returns (group_depths, n_groups, slab_depths)."""
    group_depths = max(1, 128 // cout)
    n_groups = -(-depth_out // group_depths)
    # Input depths needed by one full group: stride*(g_out-1) + kd - stride
    # + 1 + (stride-1)... computed directly from first/last tap:
    first = -pad
    last = stride * (group_depths - 1) + kd - 1 - pad
    slab_depths = last - first + 1
    return group_depths, n_groups, slab_depths


def conv3d_folded_slab(params: dict, folded: jnp.ndarray, depth_in: int,
                       stride: int = 1) -> jnp.ndarray:
    """Banded folded conv as per-group XLA convs on lane slices.

    Same contract as ``folded3d.conv3d_folded`` but returns only the output
    tensor (depth_out is implied by the shape rule).
    """
    weight = params["w"]  # [kd, kh, kw, cin, cout]
    kd = weight.shape[0]
    pad = 1
    cin, cout = weight.shape[3], weight.shape[4]
    depth_out = (depth_in + 2 * pad - kd) // stride + 1
    group_depths, n_groups, slab_depths = _group_layout(
        depth_in, depth_out, cin, cout, stride, kd, pad)

    # Front-pad ``pad`` depths of zeros so every slab read is in range; tail
    # pad so the LAST group's slab is in range too.
    batch, height, width, _ = folded.shape
    total_depths = stride * (n_groups - 1) * group_depths + slab_depths
    tail = total_depths - pad - depth_in
    padded = jnp.pad(folded, ((0, 0), (0, 0), (0, 0),
                              (pad * cin, tail * cin)))

    outputs = []
    for g in range(n_groups):
        o0 = g * group_depths
        o1 = min(depth_out, o0 + group_depths)
        lane0 = stride * o0 * cin  # == (i0 + pad) * cin, always 128-aligned
        slab = lax.slice_in_dim(padded, lane0, lane0 + slab_depths * cin,
                                axis=3)
        # Local band: j = i_local - stride*o_local (depth_pad 0 after the
        # slab shift).
        kernel = folded3d.banded_kernel(weight, slab_depths, o1 - o0,
                                        stride, 0, transposed=False)
        out = lax.conv_general_dilated(
            slab, kernel.astype(folded.dtype),
            window_strides=(stride, stride), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        outputs.append(out)
    out = jnp.concatenate(outputs, axis=-1)
    return out + jnp.tile(params["b"], (depth_out,)).astype(out.dtype)


def conv_transpose3d_folded_slab(params: dict, folded: jnp.ndarray,
                                 depth_in: int, kernel_size: int = 4,
                                 stride: int = 2,
                                 padding: int = 1) -> jnp.ndarray:
    """Banded TRANSPOSED folded conv (4x4x4 stride-2 upsamplers) as
    per-group convs on lane slices.

    Same contract as ``folded3d.conv_transpose3d_folded`` minus the returned
    depth. The output-group slab relation: output depth ``o`` gathers input
    depths ``i`` with ``0 <= stride*i - o + (kd-1-pad) < kd``; for the
    network's 128-lane groups the slab start ``(i_min + 1) * cin`` is always
    ``128 * g`` (front pad of ``cin`` zeros) and the local band
    ``j = stride*i_local - o_local`` is group-independent — the same
    alignment trick as the forward form.
    """
    weight = params["w"]
    kd = weight.shape[0]
    cin, cout = weight.shape[3], weight.shape[4]
    depth_out = (depth_in - 1) * stride - 2 * padding + kd
    group_depths = max(1, 128 // cout)
    n_groups = -(-depth_out // group_depths)
    # Input depths for outputs [o0, o0 + G): i in
    # [ceil((o0 - (kd-1-pad)) / stride), floor((o0+G-1 + pad) / stride)].
    shift = kd - 1 - padding

    def i_min(o0):
        return -(-(o0 - shift) // stride)

    def i_max(o0):
        return (o0 + group_depths - 1 + padding) // stride

    slab_depths = i_max(0) - i_min(0) + 1
    front = -i_min(0)  # zero depths prepended so slabs start in range
    total_depths = i_max((n_groups - 1) * group_depths) + 1 + front
    tail = total_depths - front - depth_in
    padded = jnp.pad(folded, ((0, 0), (0, 0), (0, 0),
                              (front * cin, max(0, tail) * cin)))

    spatial_pad = kernel_size - 1 - padding
    outputs = []
    for g in range(n_groups):
        o0 = g * group_depths
        o1 = min(depth_out, o0 + group_depths)
        lane0 = (i_min(o0) + front) * cin
        slab = lax.slice_in_dim(padded, lane0, lane0 + slab_depths * cin,
                                axis=3)
        # Local band: j = stride*i_local - o_local + (stride*i_min(o0) - o0
        # + shift); the alignment choice makes the parenthesis 0 for every
        # group, i.e. local depth_pad' = kd - 1.
        local_shift = stride * i_min(o0) - o0 + shift
        kernel = folded3d.banded_kernel(weight, slab_depths, o1 - o0, stride,
                                        kd - 1 - local_shift,
                                        transposed=True)
        out = lax.conv_general_dilated(
            slab, kernel.astype(folded.dtype), window_strides=(1, 1),
            padding=[(spatial_pad, spatial_pad)] * 2,
            lhs_dilation=(stride, stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        outputs.append(out)
    out = jnp.concatenate(outputs, axis=-1)
    return out + jnp.tile(params["b"], (depth_out,)).astype(out.dtype)


def _interleave_phases(phases, batch, height, width, channels):
    """[(a, b)] -> [B, 2H, 2W, C]: phase (a, b) supplies out[2m+a, 2n+b]."""
    stacked = jnp.stack(phases)  # [4, B, H, W, C]
    stacked = stacked.reshape(2, 2, batch, height, width, channels)
    out = jnp.transpose(stacked, (2, 3, 0, 4, 1, 5))
    return out.reshape(batch, 2 * height, 2 * width, channels)


def conv_transpose3d_folded_phased(params: dict, folded: jnp.ndarray,
                                   depth_in: int) -> jnp.ndarray:
    """Transposed 4x4x4 stride-2 folded conv as 4 PHASED stride-1 convs.

    The lhs-dilated form asks XLA to convolve a 2x-dilated input with a 4x4
    kernel; measured at the hourglass shapes it runs at ~17% MFU — the
    dilation zeros are NOT being skipped. Decomposing by output phase
    executes exactly the 2x2 spatial taps each output actually needs:
    ``out[2m+a, 2n+b]`` is a stride-1 correlation of taps ``u = a, a+2``
    (input columns ``m-1, m`` for phase 0; ``m, m+1`` for phase 1), then
    one interleave relayout. Depth mixing stays the banded folded channel
    matrix. Exact same math as ``folded3d.conv_transpose3d_folded``.
    """
    weight = params["w"]  # [4, 4, 4, cin, cout]
    depth_out = (depth_in - 1) * 2 - 2 + weight.shape[0]
    kernel = folded3d.banded_kernel(weight, depth_in, depth_out, 2, 1,
                                    transposed=True)  # [4, 4, I, O]
    kernel = kernel.astype(folded.dtype)
    batch, height, width, _ = folded.shape
    phases = []
    for a in (0, 1):
        for b in (0, 1):
            taps = kernel[a::2][:, b::2]  # [2, 2, I, O]: taps (a, a+2)
            out = lax.conv_general_dilated(
                folded, taps, window_strides=(1, 1),
                padding=[(1 - a, a), (1 - b, b)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            phases.append(out)
    out = _interleave_phases(phases, batch, height, width,
                             phases[0].shape[-1])
    return out + jnp.tile(params["b"], (depth_out,)).astype(out.dtype)


def anisotropic_fullsize_transpose_phased(params: dict, folded: jnp.ndarray,
                                          depth: int) -> jnp.ndarray:
    """The raw (3, 4, 4) stride (1, 2, 2) final upsampler, phased.

    Same phase decomposition as :func:`conv_transpose3d_folded_phased`
    (spatial kernel 4, stride 2, pad 1 on both axes; depth kernel 3 stride 1
    handled by the banded channel matrix). C -> 1, emitting disparity-last
    similarities [B, 2H, 2W, D]. Exact same math as
    ``folded3d.anisotropic_fullsize_transpose``.
    """
    weight = params["w"]  # [3, 4, 4, C, 1]
    kernel = folded3d.banded_kernel(weight, depth, depth, depth_stride=1,
                                    depth_pad=1, transposed=True)
    kernel = kernel.astype(folded.dtype)
    batch, height, width, _ = folded.shape
    phases = []
    for a in (0, 1):
        for b in (0, 1):
            taps = kernel[a::2][:, b::2]
            out = lax.conv_general_dilated(
                folded, taps, window_strides=(1, 1),
                padding=[(1 - a, a), (1 - b, b)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            phases.append(out)
    out = _interleave_phases(phases, batch, height, width, depth)
    return out + params["b"].astype(out.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel (stride 1)
# ---------------------------------------------------------------------------


def _slab_kernel(hbm_ref, weight_ref, bias_ref, out_ref, scratch, sem, *,
                 tile_h: int, out_w: int, rows: int):
    """One (H-tile, output-group) program: DMA the halo'd slab block, 9
    accumulated dots, fused bias."""
    h = pl.program_id(0)
    g = pl.program_id(1)
    dma = pltpu.make_async_copy(
        hbm_ref.at[pl.ds(h * tile_h, rows), :, pl.ds(g * 128, 256)],
        scratch, sem)
    dma.start()
    dma.wait()

    accumulator = None
    for dh in range(3):
        for dw in range(3):
            window = scratch[dh:dh + tile_h, dw:dw + out_w, :]
            flat = window.reshape(tile_h * out_w, 256)
            product = jax.lax.dot_general(
                flat, weight_ref[dh * 3 + dw],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            accumulator = (product if accumulator is None
                           else accumulator + product)
    accumulator = accumulator + bias_ref[:].astype(jnp.float32)
    out_ref[:] = accumulator.reshape(tile_h, out_w, 128).astype(
        out_ref.dtype)


def conv3d_folded_pallas(params: dict, folded: jnp.ndarray, depth_in: int,
                         stride: int = 1,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused banded folded conv (stride 1; falls back to the XLA slab form
    otherwise)."""
    if stride != 1:
        return conv3d_folded_slab(params, folded, depth_in, stride)
    weight = params["w"]
    kd, kh, kw, cin, cout = weight.shape
    pad = 1
    depth_out = depth_in  # kd=3, stride 1, pad 1
    group_depths, n_groups, slab_depths = _group_layout(
        depth_in, depth_out, cin, cout, stride, kd, pad)
    if (group_depths * cout != 128 or group_depths * cin > 256
            or kd != 3 or kh != 3 or kw != 3):
        return conv3d_folded_slab(params, folded, depth_in, stride)

    batch, height, width, _ = folded.shape
    # Spatial halo pad (1 px; W padded further so the DMA'd slice width is a
    # sublane-tile multiple of 8 — Mosaic requires it) + lane layout: front
    # pad*cin zeros, tail to 128*(n_groups-1) + 256 so every group reads a
    # full 256-lane window.
    total_lanes = 128 * (n_groups - 1) + 256
    padded_width = -(-(width + 2) // 8) * 8
    padded = jnp.pad(
        folded, ((0, 0), (1, 1), (1, padded_width - width - 1),
                 (pad * cin, total_lanes - pad * cin - depth_in * cin)))

    # Group-independent slab weights: [9, 256, 128] with local band
    # j = i_local - o_local (256 lanes = 32 local input depths at cin=8).
    local_in_depths = 256 // cin
    tap_matrices = []
    for dh in range(3):
        for dw in range(3):
            tap = folded3d.banded_kernel(
                weight[:, dh:dh + 1, dw:dw + 1], local_in_depths,
                group_depths, 1, 0, transposed=False)
            tap_matrices.append(tap[0, 0])
    weights = jnp.stack(tap_matrices).astype(folded.dtype)
    bias = jnp.tile(params["b"], (group_depths,))

    tile_h = 16
    while height % tile_h:
        tile_h //= 2
    rows = tile_h + 2
    grid = (height // tile_h, n_groups)

    run = pl.pallas_call(
        functools.partial(_slab_kernel, tile_h=tile_h, out_w=width,
                          rows=rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_h, width, 128),
                               lambda h, g: (h, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (height, width, n_groups * 128), folded.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, padded_width, 256), folded.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )

    out = jnp.stack([run(padded[b], weights, bias) for b in range(batch)])
    return lax.slice_in_dim(out, 0, depth_out * cout, axis=3)
