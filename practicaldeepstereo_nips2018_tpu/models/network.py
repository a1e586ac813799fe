"""PDS network: composition of embedding, matching, regularization, estimator.

Functional re-design of the reference's ``network.py:14-65``. The network is a
pair of pure functions over one parameter pytree:

* :func:`apply` — the differentiable forward pass producing similarity
  scores (what the reference returns in ``train()`` mode).
* :func:`infer` — :func:`apply` composed with the sub-pixel MAP estimator
  (what the reference returns in ``eval()`` mode; the estimator is never
  differentiated through — reference ``network.py:50-51``,
  ``estimator.py:19``).

There is no train/eval module flag and no stateful SizeAdapter: padding
amounts are recomputed from static shapes each call (``ops/pad.py``) and the
estimator is composed explicitly at the inference call site.

``maximum_disparity`` is a static argument, not network state: the matching
weights are shared across disparities, so changing the range (the reference's
``set_maximum_disparity``, ``network.py:26-36``) only changes loop extents —
here, the static shape of the cost volume, selecting a different jit
specialization.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from practicaldeepstereo_nips2018_tpu.models import embedding
from practicaldeepstereo_nips2018_tpu.models import matching
from practicaldeepstereo_nips2018_tpu.models import regularization
from practicaldeepstereo_nips2018_tpu.ops import pad as pad_ops
from practicaldeepstereo_nips2018_tpu.ops import subpixel


@dataclasses.dataclass(frozen=True)
class PDSConfig:
    """Static hyperparameters of the PDS network.

    Defaults mirror the reference's constructor defaults
    (``embedding.py:14-18``, ``matching.py:69-73``, ``regularization.py:74``,
    ``estimator.py:22``).
    """
    maximum_disparity: int = 255
    number_of_input_features: int = 3
    number_of_embedding_features: int = 64
    number_of_shortcut_features: int = 8
    number_of_embedding_residual_blocks: int = 2
    number_of_matching_features: int = 64
    number_of_signature_features: int = 8
    number_of_matching_residual_blocks: int = 2
    number_of_regularization_features: int = 8
    estimator_half_support_window: int = 4
    disparity_step: int = 2
    minimum_size: int = 64
    # Rematerialization policy: recompute stages in the backward pass
    # instead of storing their activations. At full resolution the
    # training-mode cost-volume activations dominate HBM (SURVEY §7 hard
    # part #1); remat trades ~1 extra forward of the checkpointed stages
    # for O(stage inputs) memory.
    #   False        — store everything (fastest when it fits: crop-sized
    #                  training, small batches).
    #   "selective"  — checkpoint only the VOLUME-SIZED stages (the paired
    #                  matching stage, whose P x 4096-lane activations
    #                  dominate stored bytes, plus the quarter-resolution
    #                  hourglass stages and the upsamplers); the cheap deep
    #                  hourglass levels (4x fewer pixels each) are stored,
    #                  not recomputed (``regularization._stage_remat``).
    #   True         — blanket: checkpoint every stage (maximum memory
    #                  headroom, most recompute).
    remat: bool | str = False
    # Execution of the folded hourglass convs: "dense" | "banded_slab" |
    # "banded_pallas" (exact alternatives, see ``ops/folded_banded.py``;
    # the Pallas form is forward-only — training keeps dense/slab).
    folded_conv_impl: str = "dense"
    # Deep-factor the matching tail's first conv through the cost-volume
    # shift-assembly (exact; ``ops/costvolume.py::conv1_volume_planes``).
    # Default OFF: the factoring removes ~122 GMac but measured +4 ms end
    # to end on v5e — the second volume assembly (24 stacked pair slices +
    # seam corrections) breaks XLA's fusion of the tail, costing more than
    # the conv it saves (scripts/ab_eval_configs.py, r3). Kept as an exact
    # opt-in: the trade may flip on chips with higher FLOP:byte ratios.
    factor_tail_conv1: bool = False
    # Execute the embedding's first 5x5-stride-2 conv in its exact
    # space-to-depth form (``ops/spacetodepth.py``): the half-res
    # 12-channel phase image reads 4x less lane-padded traffic than the
    # full-res 3-channel image. Default OFF — MEASURED NEGATIVE on v5e
    # (r4): the conv itself halves (0.51 -> 0.25 ms) but the phase
    # relayout pass costs ~0.8 ms (it reads the 42x-lane-padded image AND
    # writes a 10.7x-padded one, while XLA otherwise fuses pad+cast+norm
    # straight into the conv); composed eval 20.44 vs 20.03 ms
    # (scripts/microbench_r4_candidates.py --s2d, ab_eval_configs.py).
    # Kept as an exact opt-in: wins where the front-end cannot fuse.
    embedding_s2d: bool = False
    # INFERENCE-ONLY: run the matching tail's convolutions int8-quantized
    # (``models/matching.py::_quantized_conv``; v5e int8 peak is 2x bf16
    # and the tail sits at its bf16 roofline). Approximate — never a
    # default; accuracy measured on the real-fixture eval path
    # (``tests/test_real_fixture_parity.py``). The trainer rejects it for
    # training (round-to-int8 has zero gradient). MEASURED NEGATIVE for
    # SPEED on v5e (r4): the per-conv quantize pass + broken conv-chain
    # fusion cost more than the 2x MXU rate saves — composed eval 21.75
    # vs 20.03 ms (ab_eval_configs.py). Kept for memory-constrained or
    # higher-int8-ratio deployments.
    matching_tail_int8: bool = False

    def __post_init__(self):
        validate_maximum_disparity(self.maximum_disparity)
        if self.folded_conv_impl not in ("dense", "banded_slab",
                                         "banded_pallas"):
            raise ValueError(
                f'unknown folded_conv_impl "{self.folded_conv_impl}"; '
                'expected "dense", "banded_slab" or "banded_pallas"')
        if self.remat not in (False, True, "selective"):
            raise ValueError(
                f'unknown remat policy {self.remat!r}; expected False, '
                'True or "selective"')

    @property
    def matching_maximum_disparity(self) -> int:
        """Disparity range at descriptor (quarter) resolution.

        The embedding downsamples 4x, so the matching module covers
        ``(maximum_disparity + 1) / 4 - 1`` (reference ``network.py:31-36``).
        """
        return (self.maximum_disparity + 1) // 4 - 1

    @property
    def number_of_similarity_levels(self) -> int:
        """Output disparity levels: even disparities only, step 2."""
        return (self.maximum_disparity + 1) // 2


def validate_maximum_disparity(maximum_disparity: int) -> None:
    """(maximum_disparity + 1) must be a multiple of 64
    (reference ``network.py:26-36``): /4 for the embedding stride and /16 for
    the four stride-2 hourglass levels."""
    if (maximum_disparity + 1) % 64 != 0:
        raise ValueError(
            '"maximum_disparity" + 1 should be a multiple of 64, e.g. '
            '"maximum_disparity" can be equal to 63, 127, 191, 255...')


def init(key, config: PDSConfig = PDSConfig(), dtype=jnp.float32) -> dict:
    """Returns the full network parameter pytree."""
    embedding_key, matching_key, regularization_key = jax.random.split(key, 3)
    return {
        "embedding": embedding.init(
            embedding_key,
            number_of_input_features=config.number_of_input_features,
            number_of_embedding_features=config.number_of_embedding_features,
            number_of_shortcut_features=config.number_of_shortcut_features,
            number_of_residual_blocks=(
                config.number_of_embedding_residual_blocks),
            dtype=dtype),
        "matching": matching.init(
            matching_key,
            number_of_concatenated_descriptor_features=(
                2 * config.number_of_embedding_features),
            number_of_features=config.number_of_matching_features,
            number_of_compact_matching_signature_features=(
                config.number_of_signature_features),
            number_of_residual_blocks=(
                config.number_of_matching_residual_blocks),
            dtype=dtype),
        "regularization": regularization.init(
            regularization_key,
            number_of_features=config.number_of_regularization_features,
            dtype=dtype),
    }


def apply(params: dict,
          left_image: jnp.ndarray,
          right_image: jnp.ndarray,
          config: PDSConfig = PDSConfig(),
          compute_dtype=None,
          mesh=None) -> jnp.ndarray:
    """Forward pass: returns similarity scores (training-mode output).

    Args:
        params: pytree from :func:`init`.
        left_image, right_image: [B, H, W, 3] images (0..255 floats; H, W
            arbitrary — padded internally to multiples of 64 on the top/left,
            reference ``size_adapter.py:42-43``).
        config: static network configuration.
        compute_dtype: optional dtype (e.g. ``jnp.bfloat16``) the padded
            inputs are cast to; the output is cast back to the input dtype.
        mesh: optional device mesh. When given, the folded cost volume is
            explicitly pinned W-sharded over the ``volume`` axis at every
            hourglass level (``regularization._constrain_folded``) — the
            memory-scaling invariant, compiler-enforced rather than left to
            GSPMD propagation through the reshape-heavy folded layouts.

    Returns:
        [B, H, W, (maximum_disparity+1)/2] similarities; index d along the
        last axis scores disparity ``2*d`` pixels.
    """
    similarities = apply_padded(params, left_image, right_image, config,
                                compute_dtype, mesh)
    similarities = similarities.astype(left_image.dtype)
    return pad_ops.unpad(similarities, left_image.shape[1],
                         left_image.shape[2], spatial_axes=(1, 2))


def apply_padded(params: dict,
                 left_image: jnp.ndarray,
                 right_image: jnp.ndarray,
                 config: PDSConfig = PDSConfig(),
                 compute_dtype=None,
                 mesh=None) -> jnp.ndarray:
    """Forward pass WITHOUT the final crop: similarities at the padded
    resolution. The estimator is pixel-wise over the disparity axis, so
    inference applies it before cropping (exactly the reference's order,
    ``network.py:45-52``) and saves a full-resolution copy."""
    # Plain pad -> cast -> per-image tower. Measured (r3,
    # scripts/ab_embedding_frontend.py): XLA already fuses the pad, cast
    # and input instance norm into the first conv's passes — the "smarter"
    # alternatives (cast-first, closed-form padded moments, both images
    # concatenated into one batched call) all measured equal or WORSE; the
    # concat variant cost +2.2 ms (the batch-axis concat of two physically
    # 128-lane-padded image tensors materializes copies XLA otherwise
    # avoids). ``embedding.apply_pair`` survives as the documented negative
    # result.
    left = pad_ops.pad_to_multiple(left_image, config.minimum_size)
    right = pad_ops.pad_to_multiple(right_image, config.minimum_size)
    if compute_dtype is not None:
        left = left.astype(compute_dtype)
        right = right.astype(compute_dtype)

    left_descriptor, shortcut_from_left = embedding.apply(
        params["embedding"], left, s2d_front=config.embedding_s2d)
    right_descriptor, _ = embedding.apply(
        params["embedding"], right, s2d_front=config.embedding_s2d)
    # The matching -> regularization handoff stays in depth-FOLDED layout
    # end to end (lane order (disparity, channel)); the unfolded
    # [B, D, H, W, 8] tensor would tile 16x lane-padded (~400 MB at the
    # benchmark shape) purely as an interface artifact.
    matching_fn = functools.partial(
        matching.apply_folded,
        maximum_disparity=config.matching_maximum_disparity,
        factor_conv1=config.factor_tail_conv1,
        tail_int8=config.matching_tail_int8)
    # The matching stage is checkpointed under BOTH remat policies: its
    # paired-tail activations ([B, H/4, W/4, D/2 * 128] per conv) are the
    # single largest stored-activation block of the training step.
    if config.remat in (True, "selective"):
        matching_fn = jax.checkpoint(matching_fn)
    folded_signatures = matching_fn(params["matching"], left_descriptor,
                                    right_descriptor)
    return regularization.apply_folded(
        params["regularization"], folded_signatures,
        config.matching_maximum_disparity + 1, shortcut_from_left,
        remat=config.remat, impl=config.folded_conv_impl, mesh=mesh)


def infer(params: dict,
          left_image: jnp.ndarray,
          right_image: jnp.ndarray,
          config: PDSConfig = PDSConfig(),
          compute_dtype=None,
          mesh=None) -> jnp.ndarray:
    """Inference: similarities -> sub-pixel MAP disparity map [B, H, W].

    The estimator runs on the PADDED similarities and the crop comes last
    (the reference's order, ``network.py:50-52``): per-pixel over disparity,
    so the result is identical and the full-resolution similarity crop copy
    is avoided.
    """
    similarities = apply_padded(params, left_image, right_image, config,
                                compute_dtype, mesh)
    # XLA estimator: fused convert+reduce passes over the similarity volume
    # measure FASTER (2.1 ms vs 3.4 ms at 960x540xD96) than the Pallas
    # single-pass kernel (``ops/subpixel_pallas.py``), whose lane-axis
    # reductions are VPU-shuffle-bound rather than HBM-bound. The volume is
    # passed in its compute dtype; the estimator upconverts inside its fused
    # reduction passes (see ``ops/subpixel.py``).
    disparity = subpixel.subpixel_map(
        similarities,
        half_support_window=config.estimator_half_support_window,
        disparity_step=config.disparity_step)
    return pad_ops.unpad(disparity, left_image.shape[1],
                         left_image.shape[2], spatial_axes=(-2, -1))
