"""Base stereo dataset: a list of example records + a transformer chain.

Re-designs the reference's ``dataset.py:12-116`` for the TPU input pipeline.
An example is a nested dict

    {'left':  {'image': [H, W, 3] float32, 'disparity_image': [H, W] or None},
     'right': {'image': [H, W, 3] float32}}

(channels-LAST, unlike the reference's CHW — this is the layout the network
consumes, so no per-batch transpose is needed on the host). Unknown disparity
locations are ``inf``. Color images are read BGR->RGB float (reference
``dataset.py:67-72``).

The dataset is a plain indexable object (host-side, numpy) — device batching
and sharding live in :mod:`.loader`.
"""

from __future__ import annotations

import random
from typing import Callable, Sequence

import cv2
import numpy as np


class Dataset:
    """List-of-example-records dataset with a transformer chain."""

    def __init__(self, examples_files: Sequence[dict],
                 transformers: list | None = None):
        """Args:
            examples_files: list of example records (nested dicts of file
                paths plus optional metadata).
            transformers: list of callables example -> example applied in
                order by :meth:`__getitem__`.
        """
        self._examples_files = list(examples_files)
        self._transformers = transformers

    # -- structure manipulation (reference dataset.py:25-62) ---------------

    def split_in_two(self, size_of_first_subset: int):
        """Returns (first, second) subsets preserving transformers."""
        return (
            self.__class__(self._examples_files[:size_of_first_subset],
                           self._transformers),
            self.__class__(self._examples_files[size_of_first_subset:],
                           self._transformers),
        )

    def append_transformers(self, transformers: list) -> None:
        if not isinstance(transformers, list):
            raise ValueError('"transformers" should be a list.')
        if self._transformers is None:
            self._transformers = transformers
        else:
            self._transformers = self._transformers + transformers

    def subsample(self, number_of_examples: int,
                  random_seed: int | None = None) -> None:
        """Keeps a random subset of examples (deterministic given a seed)."""
        if random_seed is not None:
            random.seed(random_seed)
        self._examples_files = random.sample(self._examples_files,
                                             number_of_examples)

    def __len__(self) -> int:
        return len(self._examples_files)

    # -- IO ----------------------------------------------------------------

    def _read_image(self, image_filename: str) -> np.ndarray:
        """Returns an [H, W, 3] float32 RGB image (values 0..255)."""
        bgr = cv2.imread(image_filename, cv2.IMREAD_COLOR)
        if bgr is None:
            raise FileNotFoundError(image_filename)
        return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32)

    def _read_disparity_image(self, example_files: dict):
        """Returns an [H, W] float32 disparity (inf = unknown) or None."""
        raise NotImplementedError(
            '"_read_disparity_image" should be implemented in a child class.')

    def get_example(self, index: int) -> dict:
        if index >= len(self):
            raise IndexError
        example_files = self._examples_files[index]
        return {
            "left": {
                "image": self._read_image(example_files["left"]["image"]),
                "disparity_image":
                    self._read_disparity_image(example_files),
            },
            "right": {
                "image": self._read_image(example_files["right"]["image"]),
            },
        }

    def example_files(self, index: int) -> dict:
        """Returns the raw example record (paths + metadata)."""
        return self._examples_files[index]

    def set_epoch(self, epoch: int) -> None:
        """Forwards the epoch to transformers that derive per-(epoch,
        example) random state (e.g. seeded RandomCrop); called by the
        Loader at each epoch boundary."""
        for transformer in self._transformers or []:
            if hasattr(transformer, "set_epoch"):
                transformer.set_epoch(epoch)

    def __getitem__(self, index: int) -> dict:
        example = self.get_example(index)
        if self._transformers is not None:
            for transformer in self._transformers:
                if getattr(transformer, "wants_index", False):
                    example = transformer(example, index)
                else:
                    example = transformer(example)
        return example
