"""Example transformers: pure functions example -> example.

The reference ships a single ``CentralCrop`` transformer mutating tensors in
place (reference ``transformers.py:7-35``). This module keeps the same
central-crop semantics (needed for the small-training-split protocol,
reference ``flyingthings3d_dataset.py:333-353``) and adds the transforms a
batched/data-parallel TPU pipeline needs that the reference's batch-size-1
loop never did: random crops for augmentation-free uniform batching and
pad-to-size for bucketing variable-size datasets (KITTI).
"""

from __future__ import annotations

import random

import numpy as np


def _crop_example(example: dict, y_start: int, x_start: int, height: int,
                  width: int) -> dict:
    for side in ("left", "right"):
        for key, value in example[side].items():
            if value is None or not hasattr(value, "shape"):
                continue
            example[side][key] = value[y_start:y_start + height,
                                       x_start:x_start + width]
    return example


class CentralCrop:
    """Crops the same central area from left/right images and disparity."""

    def __init__(self, height: int, width: int):
        self._height = height
        self._width = width

    def __call__(self, example: dict) -> dict:
        full_height, full_width = example["left"]["image"].shape[:2]
        y_start = (full_height - self._height) // 2
        x_start = (full_width - self._width) // 2
        return _crop_example(example, y_start, x_start, self._height,
                             self._width)


class RandomCrop:
    """Crops the same random area from left/right images and disparity.

    Used to build uniform-size batches for data-parallel training (the
    reference trains batch-1 full-size and needs no such thing).

    The crop position is deterministic in (seed, epoch, example index):
    :class:`~..data.dataset.Dataset` passes the example index
    (``wants_index``) and :class:`~..data.loader.Loader` propagates the
    epoch — so training is bit-reproducible across runs and resumes, and
    per-host crop streams are coordinated by construction (every host
    derives the same crop for the same global example, whatever the loader
    sharding). An explicitly supplied ``rng`` overrides the derived
    seeding (legacy non-reproducible behavior).
    """

    wants_index = True

    def __init__(self, height: int, width: int,
                 rng: random.Random | None = None, seed: int = 0):
        self._height = height
        self._width = width
        self._rng = rng
        self._seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __call__(self, example: dict, index: int = 0) -> dict:
        rng = self._rng
        if rng is None:
            rng = random.Random(
                (self._seed * 1_000_003 + self._epoch) * 1_000_003 + index)
        full_height, full_width = example["left"]["image"].shape[:2]
        y_start = rng.randint(0, max(0, full_height - self._height))
        x_start = rng.randint(0, max(0, full_width - self._width))
        return _crop_example(example, y_start, x_start, self._height,
                             self._width)


class PadToSize:
    """Zero-pads images (inf-pads disparity) on the top/left to a fixed size.

    Matches the network's top/left padding convention
    (``ops/pad.py``; reference ``size_adapter.py:42-43``) so padded pixels
    carry no ground truth and are excluded from the loss by the inf mask.
    """

    def __init__(self, height: int, width: int):
        self._height = height
        self._width = width

    def __call__(self, example: dict) -> dict:
        for side in ("left", "right"):
            for key, value in example[side].items():
                if value is None or not hasattr(value, "shape"):
                    continue
                pad_h = self._height - value.shape[0]
                pad_w = self._width - value.shape[1]
                if pad_h < 0 or pad_w < 0:
                    raise ValueError(
                        f"example of size {value.shape[:2]} exceeds pad "
                        f"target ({self._height}, {self._width})")
                pad = [(pad_h, 0), (pad_w, 0)] + [(0, 0)] * (value.ndim - 2)
                fill = np.inf if key == "disparity_image" else 0.0
                example[side][key] = np.pad(value, pad, constant_values=fill)
        return example


class MaskLargeDisparities:
    """Sets disparities outside [0, maximum] to inf (unknown).

    The benchmark-protocol masking transform (reference
    ``flyingthings3d_dataset.py:276-281``).
    """

    def __init__(self, maximum_disparity: float):
        self._maximum_disparity = maximum_disparity

    def __call__(self, example: dict) -> dict:
        disparity = example["left"].get("disparity_image")
        if disparity is not None:
            out_of_range = (disparity < 0) | (disparity >
                                              self._maximum_disparity)
            disparity = disparity.copy()
            disparity[out_of_range] = np.inf
            example["left"]["disparity_image"] = disparity
        return example
