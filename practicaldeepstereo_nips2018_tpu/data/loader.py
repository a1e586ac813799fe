"""Host-side input pipeline: threaded prefetch + batching + host sharding.

The reference feeds the GPU with ``torch.utils.data.DataLoader(batch_size=1,
num_workers=3)`` (reference ``train_on_flyingthings3d.py:55-66``) — its only
form of parallelism. The TPU pipeline needs more: uniform numpy batches for
data-parallel meshes, per-host example sharding for multi-host training, and
prefetch that overlaps decode (cv2/PFM release the GIL) with device steps.

:class:`Loader` iterates a :class:`~..data.dataset.Dataset` and yields
batches — nested dicts of stacked float32 numpy arrays

    {'left': {'image': [B, H, W, 3], 'disparity_image': [B, H, W]},
     'right': {'image': [B, H, W, 3]}}

(``disparity_image`` omitted when the dataset has no ground truth). A
``ThreadPoolExecutor`` decodes ``prefetch_factor * batch_size`` examples
ahead; epoch shuffling is deterministic per (seed, epoch).
"""

from __future__ import annotations

import concurrent.futures
import os
import random
from typing import Iterator

import numpy as np


def _stack_examples(examples: list[dict]) -> dict:
    batch = {
        "left": {
            "image": np.stack([e["left"]["image"] for e in examples]),
        },
        "right": {
            "image": np.stack([e["right"]["image"] for e in examples]),
        },
    }
    disparities = [e["left"].get("disparity_image") for e in examples]
    if all(d is not None for d in disparities):
        batch["left"]["disparity_image"] = np.stack(disparities)
    return batch


class Loader:
    """Prefetching, sharding batch loader over an indexable dataset."""

    def __init__(self,
                 dataset,
                 batch_size: int = 1,
                 shuffle: bool = False,
                 num_workers: int = 3,
                 drop_last: bool = False,
                 seed: int = 0,
                 host_index: int = 0,
                 host_count: int = 1,
                 prefetch_factor: int = 2,
                 equal_shards: bool = False):
        """Args:
            dataset: indexable dataset of example dicts.
            batch_size: per-HOST batch size (the device mesh further splits
                it across local devices).
            shuffle: reshuffle example order each epoch (deterministic in
                (seed, epoch)).
            num_workers: decode threads.
            drop_last: drop the trailing incomplete batch (required for
                static-shape jit when batch_size > 1).
            host_index, host_count: this host's shard of the example stream
                (multi-host data parallelism; every host must use the same
                seed so the shards partition each epoch's permutation).
            prefetch_factor: number of examples decoded ahead, per worker.
            equal_shards: truncate every host's shard to the GLOBAL minimum
                (drop the epoch's remainder examples). Required for
                cross-process mesh training, where every host must execute
                the same number of collective train steps — an unequal split
                (e.g. 2+1 over two hosts) deadlocks the lagging host's
                collective. Leave False for eval, where full coverage
                matters and the metric reduction is a single per-epoch
                collective that tolerates unequal shard sizes.
        """
        self._dataset = dataset
        self._batch_size = batch_size
        self._shuffle = shuffle
        self._num_workers = max(1, num_workers)
        self._drop_last = drop_last
        self._seed = seed
        self._host_index = host_index
        self._host_count = host_count
        self._prefetch = max(1, prefetch_factor) * max(1, num_workers)
        self._equal_shards = equal_shards
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Sets the epoch used for the deterministic shuffle."""
        self._epoch = epoch

    def _epoch_indices(self) -> list[int]:
        indices = list(range(len(self._dataset)))
        if self._shuffle:
            random.Random(self._seed + self._epoch).shuffle(indices)
        # Host shard: contiguous stride partition of the permuted stream.
        shard = indices[self._host_index::self._host_count]
        if self._equal_shards and self._host_count > 1:
            shard = shard[:len(indices) // self._host_count]
        return shard

    def __len__(self) -> int:
        number = len(self._epoch_indices())
        if self._drop_last:
            return number // self._batch_size
        return -(-number // self._batch_size)

    def _example_names(self, indices: list[int]) -> list[str] | None:
        """Source-file basenames of the batch's examples (submission export
        must be named after the example's own file, not its loader position).
        None when the dataset carries no path records."""
        if not hasattr(self._dataset, "example_files"):
            return None
        names = []
        for index in indices:
            record = self._dataset.example_files(index)
            try:
                path = record["left"]["image"]
            except (KeyError, TypeError):
                return None
            names.append(os.path.basename(path))
        return names

    def _build_batch(self, examples: list[dict],
                     indices: list[int]) -> dict:
        batch = _stack_examples(examples)
        names = self._example_names(indices)
        if names is not None:
            batch["names"] = names
        return batch

    def __iter__(self) -> Iterator[dict]:
        if hasattr(self._dataset, "set_epoch"):
            # Transformers with per-(epoch, example) random state (seeded
            # RandomCrop) need the epoch to vary their draws across epochs
            # while staying bit-reproducible.
            self._dataset.set_epoch(self._epoch)
        indices = self._epoch_indices()
        with concurrent.futures.ThreadPoolExecutor(
                max_workers=self._num_workers) as pool:
            pending = []
            cursor = 0

            def enqueue():
                nonlocal cursor
                while cursor < len(indices) and len(pending) < self._prefetch:
                    pending.append(
                        (pool.submit(self._dataset.__getitem__,
                                     indices[cursor]), indices[cursor]))
                    cursor += 1

            enqueue()
            batch, batch_indices = [], []
            while pending:
                future, index = pending.pop(0)
                example = future.result()
                enqueue()
                batch.append(example)
                batch_indices.append(index)
                if len(batch) == self._batch_size:
                    yield self._build_batch(batch, batch_indices)
                    batch, batch_indices = [], []
            if batch and not self._drop_last:
                yield self._build_batch(batch, batch_indices)
        self._epoch += 1
