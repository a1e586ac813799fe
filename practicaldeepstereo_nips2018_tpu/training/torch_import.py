"""Imports the reference's PyTorch checkpoint into this framework's params.

The reference distributes a pretrained checkpoint (``README.md:33``, trained
to MAE 1.04 px on FlyingThings3D) saved by ``trainer.py:110-122`` as a dict
whose ``'network'`` entry is the ``PdsNetwork`` state_dict. This module maps
that state_dict onto this framework's parameter pytree so the published
accuracy can be evaluated (and fine-tuned) without retraining.

Layout conversions (torch -> lax):
    Conv2d  [O, I, kh, kw]        -> HWIO  [kh, kw, I, O]
    Conv3d  [O, I, kd, kh, kw]    -> DHWIO [kd, kh, kw, I, O]
    ConvTranspose3d [I, O, kd, kh, kw]
        -> spatially flipped DHWIO [kd, kh, kw, I, O]
        (this framework implements transposed convs as input-dilated GATHER
        convolutions, which correlate with the flipped torch kernel —
        see ``models/blocks.py::conv_transpose``)
    InstanceNorm weight/bias      -> scale/bias

Structural mapping (reference module attribute paths -> params pytree):
    _embedding._embedding_modules.{1,2}        -> embedding.conv{1,2}
    _embedding._embedding_modules.{3,4}        -> embedding.residual{1,2}
    _embedding._shortcut                       -> embedding.shortcut
    _matching._operation...modules.0           -> matching.head
    _matching._operation...modules.{1,2}       -> matching.residual{1,2}
    _matching._operation...modules.3           -> matching.tail
    _regularization._smoothing                 -> regularization.smoothing
    _regularization._contraction_blocks.{i}    -> regularization.contraction{i+1}
    _regularization._expansion_blocks.{i}      -> regularization.expansion{i+1}
    _regularization._upsample_to_{half,full}size -> same names
"""

from __future__ import annotations

import numpy as np


def _conv_nd(state: dict, prefix: str) -> dict:
    weight = np.asarray(state[f"{prefix}.weight"])
    bias = np.asarray(state[f"{prefix}.bias"])
    # [O, I, *k] -> [*k, I, O]
    weight = np.moveaxis(weight, (0, 1), (-1, -2))
    return {"w": np.ascontiguousarray(weight).astype(np.float32),
            "b": bias.astype(np.float32)}


def _conv_transpose_nd(state: dict, prefix: str) -> dict:
    weight = np.asarray(state[f"{prefix}.weight"])  # [I, O, *k]
    bias = np.asarray(state[f"{prefix}.bias"])
    spatial_axes = tuple(range(2, weight.ndim))
    weight = np.flip(weight, axis=spatial_axes)      # gather convention
    weight = np.moveaxis(weight, (0, 1), (-2, -1))   # -> [*k, I, O]
    return {"w": np.ascontiguousarray(weight).astype(np.float32),
            "b": bias.astype(np.float32)}


def _norm(state: dict, prefix: str) -> dict:
    return {"scale": np.asarray(state[f"{prefix}.weight"]).astype(np.float32),
            "bias": np.asarray(state[f"{prefix}.bias"]).astype(np.float32)}


def _conv_block(state: dict, prefix: str) -> dict:
    """Sequential(conv, LeakyReLU, InstanceNorm) -> conv/norm params."""
    return {"conv": _conv_nd(state, f"{prefix}.0"),
            "norm": _norm(state, f"{prefix}.2")}


def _conv_transpose_block(state: dict, prefix: str) -> dict:
    return {"conv": _conv_transpose_nd(state, f"{prefix}.0"),
            "norm": _norm(state, f"{prefix}.2")}


def _residual_block(state: dict, prefix: str) -> dict:
    return {"block1": _conv_block(state, f"{prefix}.convolutions.0"),
            "block2": _conv_block(state, f"{prefix}.convolutions.1")}


def params_from_torch_state_dict(state: dict) -> dict:
    """Converts the reference PdsNetwork state_dict to a params pytree."""
    state = {key: value for key, value in state.items()}
    embedding = {
        "conv1": _conv_block(state, "_embedding._embedding_modules.1"),
        "conv2": _conv_block(state, "_embedding._embedding_modules.2"),
        "residual1": _residual_block(state,
                                     "_embedding._embedding_modules.3"),
        "residual2": _residual_block(state,
                                     "_embedding._embedding_modules.4"),
        "shortcut": _conv_block(state, "_embedding._shortcut"),
    }
    operation = "_matching._operation._matching_operation_modules"
    matching = {
        "head": _conv_nd(state, f"{operation}.0"),
        "residual1": _residual_block(state, f"{operation}.1"),
        "residual2": _residual_block(state, f"{operation}.2"),
        "tail": _conv_nd(state, f"{operation}.3"),
    }
    regularization = {
        "smoothing": _conv_block(state, "_regularization._smoothing"),
        "upsample_to_halfsize": _conv_transpose_block(
            state, "_regularization._upsample_to_halfsize"),
        "upsample_to_fullsize": _conv_transpose_nd(
            state, "_regularization._upsample_to_fullsize"),
    }
    for index in range(4):
        contraction = f"_regularization._contraction_blocks.{index}"
        regularization[f"contraction{index + 1}"] = {
            "down": _conv_block(state, f"{contraction}._downsampling_2x"),
            "smooth": _conv_block(state, f"{contraction}._smoothing"),
        }
        expansion = f"_regularization._expansion_blocks.{index}"
        regularization[f"expansion{index + 1}"] = {
            "up": _conv_transpose_block(state,
                                        f"{expansion}._upsampling_2x"),
            "smooth": _conv_block(state, f"{expansion}._smoothing"),
        }
    return {"embedding": embedding, "matching": matching,
            "regularization": regularization}


def load_torch_checkpoint(filename: str) -> dict:
    """Loads a reference checkpoint file and returns the params pytree."""
    import torch
    checkpoint = torch.load(filename, map_location="cpu",
                            weights_only=False)
    state = checkpoint["network"] if "network" in checkpoint else checkpoint
    state = {key: value.numpy() if hasattr(value, "numpy") else value
             for key, value in state.items()}
    return params_from_torch_state_dict(state)
