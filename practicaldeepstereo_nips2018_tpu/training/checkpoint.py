"""Checkpointing: pytree state to a single .npz file, multi-host safe.

Keeps the reference's checkpoint CONTRACT (reference ``trainer.py:87-122``):
a per-epoch file holding {training_losses, test_errors, network state,
optimizer state, scheduler state}, written after every epoch as
``{epoch:03d}_checkpoint.npz``, restorable either fully (resume: epoch
counter = len(training_losses)) or network-only (fine-tuning / eval,
``load_only_network=True``).

Implementation is numpy-based (no torch pickle, no orbax version coupling):
arrays are the flattened pytree leaves keyed by ``<name>.<index>``, the
treedef is rebuilt from a caller-supplied template (the trainer always
constructs params/opt_state before loading, exactly like the reference
constructs the network before ``load_state_dict``). Scalars/lists travel in a
small JSON blob. Multi-host: only process 0 writes (single-writer), all
processes read.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def save_checkpoint(filename: str, trees: dict, metadata: dict) -> None:
    """Saves pytrees + JSON metadata to ``filename`` (atomic rename).

    Args:
        filename: target ``.npz`` path.
        trees: dict name -> pytree of arrays (params, opt_state, ...).
        metadata: JSON-serializable dict (losses, errors, epoch, ...).
    """
    if jax.process_index() != 0:
        return
    # One device_get over the whole state, not np.asarray per leaf: it
    # starts ALL device->host copies asynchronously before blocking, so the
    # fetch pays one transport round-trip instead of one per leaf.
    # Measured (r5, relayed TPU v5e, 3-step full-size epochs back-to-back
    # around this change): 7.5 s/epoch -> 1.4-2.0 s/epoch — the serial
    # per-leaf fetch of the ~450-leaf params+opt_state tree was ~6 s of
    # every epoch's checkpoint save.
    trees = jax.device_get(trees)
    arrays = {}
    for name, tree in trees.items():
        for index, leaf in enumerate(jax.tree.leaves(tree)):
            arrays[f"{name}.{index}"] = np.asarray(leaf)
    arrays["__metadata__"] = np.frombuffer(
        json.dumps(metadata).encode("utf-8"), dtype=np.uint8)
    temporary = filename + ".tmp"
    with open(temporary, "wb") as handle:
        np.savez(handle, **arrays)
    os.replace(temporary, filename)


def load_checkpoint(filename: str, templates: dict):
    """Loads pytrees + metadata from ``filename``.

    Args:
        filename: ``.npz`` checkpoint path.
        templates: dict name -> template pytree with the same structure the
            tree had at save time (values are ignored, only structure and
            leaf order matter). Only the requested names are restored.

    Returns:
        (trees, metadata): restored pytrees keyed like ``templates`` and the
        metadata dict.
    """
    with np.load(filename) as content:
        metadata = json.loads(bytes(content["__metadata__"]).decode("utf-8"))
        trees = {}
        for name, template in templates.items():
            leaves, treedef = jax.tree.flatten(template)
            stored = sum(1 for key in content.files
                         if key.startswith(f"{name}."))
            if stored != len(leaves):
                raise ValueError(
                    f'checkpoint "{filename}" holds {stored} "{name}" '
                    f"arrays but the template expects {len(leaves)} — "
                    "the checkpoint was written by a different network/"
                    "optimizer configuration")
            restored = [content[f"{name}.{index}"]
                        for index in range(len(leaves))]
            for index, (leaf, value) in enumerate(zip(leaves, restored)):
                expected = getattr(leaf, "shape", None)
                if expected is not None and tuple(value.shape) != tuple(
                        expected):
                    raise ValueError(
                        f'checkpoint "{filename}" array "{name}.{index}" '
                        f"has shape {tuple(value.shape)} but the template "
                        f"expects {tuple(expected)} — configuration "
                        "mismatch")
            trees[name] = jax.tree.unflatten(treedef, restored)
    return trees, metadata


def checkpoint_filename(experiment_folder: str, epoch: int) -> str:
    """Reference naming scheme: ``{epoch:03d}_checkpoint`` (``trainer.py:84``),
    with the .npz container extension."""
    return os.path.join(experiment_folder, f"{epoch:03d}_checkpoint.npz")
