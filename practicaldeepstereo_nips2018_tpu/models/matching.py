"""Matching stage: disparity-batched siamese head over the cost volume.

Functional re-design of the reference's ``matching.py``. The reference runs a
Python loop over disparities, each iteration applying the full
``MatchingOperation`` CNN (raw 3x3 conv 128->64, two residual blocks, raw 3x3
conv 64->8; reference ``matching.py:81-95``) to a shifted concatenation — the
hottest loop in the network.

TPU-native formulation, in two moves:

1. The 128-input head conv is *linearity-factored* into two 64-input convs
   computed ONCE, plus zero-cost column-shift adds (see
   ``ops/costvolume.py``) — exact reference semantics, ~D-fold fewer head
   FLOPs.
2. The rest of the head (residual blocks + 64->8 tail) is weight-shared
   across disparities, so it runs as ONE batched convolution with the
   disparity axis folded into the batch dimension. Instance norm inside the
   residual blocks normalizes per (batch*disparity, channel) over H,W —
   identical to the reference running each disparity as its own forward pass.

Output layout: [B, D+1, H/4, W/4, 8] (channels last; the reference's is
[B, 8, D+1, H/4, W/4]).

Why the paired 2x structural-MAC overhead is kept (round-3 kernel study,
measured tail MFU 77% of bf16 peak on executed MACs):

* The tail's convs are cin=64 -> cout=64. Any direct matmul form has
  N = cout = 64, i.e. half the MXU's 128 output lanes — exactly the 2x the
  block-diagonal pairing pays, but pairing keeps every tile full and lets
  XLA fuse. Measured in round 2: pairing beat the lane-padded N=64 form.
* The transposed form (out^T = W^T @ in^T, M=64 free, N=pixel lanes) fixes
  N but caps K at cin=64 per spatial tap (50% again); raising K needs
  either im2col copies (~9x the activation bytes through VMEM per conv —
  ~6 ms of VPU traffic at the benchmark shape, more than it saves) or an
  [H, C, W] layout whose 3-row window gives K=192 for free — but then each
  MXU dot is [64, 192]x[192, 256] (~6 MFLOP), and the ~93k-dot issue
  overhead dominates. Widening N with the disparity axis ([H, C, D*W]
  layout) makes the dots big enough but the volume (226 MB) cannot be
  VMEM-resident, and per-layer HBM streaming plus two-phase instance norms
  lands within noise of the current 6.5 ms.
* Conclusion: ~6.5 ms at 77% executed-MFU is this tail's practical floor
  on v5e without changing numerics (e.g. int8). The useful-MAC floor
  (3.3 ms) is unreachable by re-tiling alone.

Round-4 measurements closing the two remaining levers (both kept in-tree
as tested opt-ins / documented negatives, scripts/microbench_r4_candidates
+ scripts/ab_eval_configs):

* int8 (``_quantized_conv``): XLA:TPU's s8xs8->s32 conv only reaches
  1.19x the bf16 conv at the tail shape (1.188 -> 0.994 ms — far from the
  2x MXU peak), the quantize pass adds 0.151 ms per conv input, and the
  int8/int32 boundary breaks the conv-chain fusion — composed eval
  21.75 ms vs 20.03 baseline. Opt-in (``PDSConfig.matching_tail_int8``),
  inference-only, accuracy pinned on the real fixtures.
* Instance-norm fusion into conv epilogues: NO prize — the paired tail
  measures FASTER with its 4 norms (6.19 ms) than with them removed
  (7.01 ms): XLA already fuses the moment/apply passes into the
  surrounding convs, and removing them merely rearranges fusions. A
  Pallas conv+stats epilogue kernel has nothing to reclaim here (and the
  hourglass-side bound is 0.45 ms total, below Pallas engineering noise —
  r3 measured Pallas slab == XLA slab).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from practicaldeepstereo_nips2018_tpu.models import blocks
from practicaldeepstereo_nips2018_tpu.ops import costvolume


def init(key,
         number_of_concatenated_descriptor_features: int = 128,
         number_of_features: int = 64,
         number_of_compact_matching_signature_features: int = 8,
         number_of_residual_blocks: int = 2,
         dtype=jnp.float32) -> dict:
    """Returns MatchingOperation parameters (reference ``matching.py:69-95``).

    The head conv keeps the reference's single [3, 3, 128, 64] kernel layout
    (it is sliced into left/right halves at apply time), so checkpoints map
    1:1 onto the reference's parameterization.
    """
    keys = jax.random.split(key, number_of_residual_blocks + 2)
    params = {
        "head": blocks.init_conv(
            keys[0], 3, number_of_concatenated_descriptor_features,
            number_of_features, dtype=dtype),
        "tail": blocks.init_conv(
            keys[1], 3, number_of_features,
            number_of_compact_matching_signature_features, dtype=dtype),
    }
    for i in range(number_of_residual_blocks):
        params[f"residual{i + 1}"] = blocks.init_residual_block(
            keys[2 + i], number_of_features, dtype=dtype)
    return params


def _operation_tail(params: dict, volume: jnp.ndarray) -> jnp.ndarray:
    """Applies the post-head matching operation, disparity folded into batch.

    Args:
        volume: [B, D, H, W, F] head-conv outputs.
    Returns:
        [B, D, H, W, S] compact matching signatures.
    """
    batch, disparities, height, width, features = volume.shape
    x = volume.reshape(batch * disparities, height, width, features)
    residual_count = sum(1 for name in params if name.startswith("residual"))
    for i in range(residual_count):
        x = blocks.residual_block(params[f"residual{i + 1}"], x)
    x = blocks.conv(params["tail"], x)
    return x.reshape(batch, disparities, height, width, x.shape[-1])


def apply(params: dict,
          left_descriptor: jnp.ndarray,
          right_descriptor: jnp.ndarray,
          maximum_disparity: int) -> jnp.ndarray:
    """Returns compact matching signatures for every disparity.

    Args:
        left_descriptor, right_descriptor: [B, H/4, W/4, 64] embeddings.
        maximum_disparity: largest disparity index (inclusive) at the
            descriptor resolution — ``(max_disparity+1)/4 - 1`` of the image-
            space range (reference ``network.py:26-36``).

    Returns:
        [B, maximum_disparity+1, H/4, W/4, 8] cost volume.
    """
    volume = costvolume.build_cost_volume(params["head"], left_descriptor,
                                          right_descriptor,
                                          maximum_disparity)
    return _operation_tail(params, volume)


# ---------------------------------------------------------------------------
# Disparity-paired execution path (the layout the network actually runs)
# ---------------------------------------------------------------------------


def _pair_conv(conv_params: dict) -> dict:
    """[kh, kw, cin, cout] conv params -> block-diagonal 2-pair form.

    The paired tensor carries two disparities in its lanes; the SAME
    per-disparity kernel must act on each half independently, which as one
    dense conv is the block-diagonal kernel diag(w, w) — 2x structural-zero
    MACs, executed at 2x MXU width (N: 64 -> 128), at HALF the lane-padded
    memory traffic. See ``ops/costvolume.py::shift_accumulate_volume_paired``
    for the measurement rationale.
    """
    w, b = conv_params["w"], conv_params["b"]
    kh, kw, cin, cout = w.shape
    paired = jnp.zeros((kh, kw, 2 * cin, 2 * cout), w.dtype)
    paired = paired.at[:, :, :cin, :cout].set(w)
    paired = paired.at[:, :, cin:, cout:].set(w)
    return {"w": paired, "b": jnp.tile(b, 2)}


def _pair_norm(norm_params: dict) -> dict:
    return {"scale": jnp.tile(norm_params["scale"], 2),
            "bias": jnp.tile(norm_params["bias"], 2)}


def _pair_conv_block(block_params: dict) -> dict:
    return {"conv": _pair_conv(block_params["conv"]),
            "norm": _pair_norm(block_params["norm"])}


def _pair_tail_params(params: dict) -> dict:
    paired = {"tail": _pair_conv(params["tail"])}
    for name, value in params.items():
        if name.startswith("residual"):
            paired[name] = {"block1": _pair_conv_block(value["block1"]),
                            "block2": _pair_conv_block(value["block2"])}
    return paired


def _quantized_conv(conv_params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """int8 x int8 -> int32 execution of a 3x3 conv (inference only).

    v5e executes s8xs8 matmuls at 2x the bf16 MXU rate; the paired tail is
    measured AT its bf16 roofline (77% executed-MFU, module docstring), so
    int8 is the only >1.5x lever left on it. Quantization: symmetric
    per-OUTPUT-CHANNEL weight scales (static given params) and symmetric
    per-BATCH-ENTRY dynamic activation scales (one max-abs reduction —
    fused by XLA into the producing pass). Biases and the surrounding
    leaky/norm/residual arithmetic stay in the activation dtype, so the
    only approximation is the 8-bit rounding of the conv operands.
    """
    weight, bias = conv_params["w"], conv_params["b"]
    weight_scale = (jnp.max(jnp.abs(weight), axis=(0, 1, 2))
                    .astype(jnp.float32) / 127.0 + 1e-30)
    weight_q = jnp.round(weight.astype(jnp.float32)
                         / weight_scale).astype(jnp.int8)
    # Per BATCH-ENTRY activation scale (each entry is one (example,
    # disparity-pair) slice): a whole-tensor scale would couple the
    # examples of a batch, breaking the batched-eval == sequential-eval
    # contract the trainer's data-sharded protocol relies on.
    x_scale = (jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True)
               .astype(jnp.float32) / 127.0 + 1e-30)
    x_q = jnp.round(x.astype(jnp.float32) / x_scale).astype(jnp.int8)
    out = jax.lax.conv_general_dilated(
        x_q, weight_q, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = out.astype(jnp.float32) * (weight_scale * x_scale)
    return (out + bias.astype(jnp.float32)).astype(x.dtype)


def _quantized_conv_block(block_params: dict, x: jnp.ndarray) -> jnp.ndarray:
    return blocks.instance_norm(
        blocks.leaky_relu(_quantized_conv(block_params["conv"], x)),
        block_params["norm"])


def _quantized_residual_block(block_params: dict,
                              x: jnp.ndarray) -> jnp.ndarray:
    return _quantized_conv_block(
        block_params["block2"],
        _quantized_conv_block(block_params["block1"], x)) + x


def apply_folded(params: dict,
                 left_descriptor: jnp.ndarray,
                 right_descriptor: jnp.ndarray,
                 maximum_disparity: int,
                 factor_conv1: bool = True,
                 tail_int8: bool = False) -> jnp.ndarray:
    """Matching signatures directly in depth-FOLDED layout.

    Returns [B, H/4, W/4, (D+1)*8] — lane order (disparity, channel), i.e.
    exactly ``folded3d.fold`` of :func:`apply`'s output, which is what the
    regularization hourglass consumes. Producing it natively avoids ever
    materializing the [B, D, H, W, 8] tensor, whose 8-wide lane dim tiles
    16x-padded (~400 MB at the benchmark shape).

    Execution: disparity-paired volume + block-diagonal tail (see
    :func:`_pair_conv`); instance norm in the paired layout normalizes each
    (sample*pair, channel-half) over H, W — identical to the per-disparity
    norm of the reference (each of the 128 lanes belongs to exactly one
    disparity). Falls back to :func:`apply` + fold for odd disparity counts
    (only reachable in hand-built test configs).

    ``tail_int8``: run the tail's convs quantized (:func:`_quantized_conv`)
    — an opt-in INFERENCE mode (``PDSConfig.matching_tail_int8``); the
    trainer rejects it for training (round-to-int8 has zero gradient).
    """
    if (maximum_disparity + 1) % 2:
        from practicaldeepstereo_nips2018_tpu.ops import folded3d
        return folded3d.fold(apply(params, left_descriptor, right_descriptor,
                                   maximum_disparity))
    planes = costvolume.matching_head_planes(
        params["head"], left_descriptor, right_descriptor)
    paired_volume = costvolume.shift_accumulate_volume_paired(
        *planes, maximum_disparity)
    batch, num_pairs, height, width, lanes = paired_volume.shape
    paired_params = _pair_tail_params(params)
    residual_count = sum(1 for name in params if name.startswith("residual"))

    if factor_conv1:
        # Deep factoring: residual block 1's first conv is the last LINEAR
        # point of the pipeline, so it factors through the shift-assembly
        # like the head conv did (``ops/costvolume.py::conv1_volume_planes``)
        # — two 64-channel plane convs replace the largest disparity-batched
        # conv of the tail (~122 GMac executed at the benchmark shape).
        conv1_planes = costvolume.conv1_volume_planes(
            params["residual1"]["block1"]["conv"], *planes)
        conv1_paired = costvolume.assemble_conv1_volume_paired(
            conv1_planes, maximum_disparity, width)
        volume = paired_volume.reshape(batch * num_pairs, height, width,
                                       lanes)
        y = conv1_paired.reshape(batch * num_pairs, height, width, -1)
        residual1 = paired_params["residual1"]
        y = blocks.instance_norm(blocks.leaky_relu(y),
                                 residual1["block1"]["norm"])
        x = volume + blocks.conv_block(residual1["block2"], y)
        first_residual = 1
    else:
        x = paired_volume.reshape(batch * num_pairs, height, width, lanes)
        first_residual = 0

    residual_fn = (_quantized_residual_block if tail_int8
                   else blocks.residual_block)
    for i in range(first_residual, residual_count):
        x = residual_fn(paired_params[f"residual{i + 1}"], x)
    if tail_int8:
        x = _quantized_conv(paired_params["tail"], x)
    else:
        x = blocks.conv(paired_params["tail"], x)
    # [B*P, H, W, 16] -> folded [B, H, W, P*16]; lane index
    # p*16 + m*8 + c == disparity*8 + c — the fold order.
    signatures = x.reshape(batch, num_pairs, height, width, x.shape[-1])
    return jnp.moveaxis(signatures, 1, 3).reshape(
        batch, height, width, num_pairs * x.shape[-1])
