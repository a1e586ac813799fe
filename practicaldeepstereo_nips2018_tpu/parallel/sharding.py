"""Sharding rules: how PDS tensors lay out over the (data, volume) mesh.

Strategy (the "CP analogue" from SURVEY.md §5: the cost volume is the
long-context axis of this model):

* images [B, H, W, 3], descriptors [B, H/4, W/4, C]: batch over ``data``,
  W over ``volume``;
* cost volume [B, D, H, W, C]: batch over ``data``, W over ``volume``
  (disparity left unsharded so the matching shift-adds and the
  estimator/loss disparity softmax are shard-local; W-sharding gives the 3D
  hourglass convs halo exchanges of width 1 per conv, which GSPMD inserts
  automatically);
* similarities [B, H, W, D]: batch over ``data``, W over ``volume``;
* parameters: replicated.

Everything is expressed as ``NamedSharding``/``with_sharding_constraint`` —
the XLA SPMD partitioner derives the collectives (halo ``ppermute``s for the
spatial convs, ``psum`` for the DP gradient reduction). No hand-written
communication; that is the TPU-idiomatic division of labor.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from practicaldeepstereo_nips2018_tpu.parallel.mesh import (
    DATA_AXIS, VOLUME_AXIS)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for host->device batches: [B, H, W, ...] with B over
    ``data`` and W over ``volume``."""
    return NamedSharding(mesh, P(DATA_AXIS, None, VOLUME_AXIS))


def compatible_batch_sharding(mesh: Mesh, shape: tuple) -> NamedSharding:
    """Batch sharding degraded to what ``shape`` can actually carry.

    B goes over ``data`` and W (axis 2 of both [B, H, W, C] images and
    [B, H, W] disparity maps) over ``volume`` — but only when the dimension
    is divisible by the axis size. Validation/benchmark loaders use
    ``batch_size=1`` (the reference's protocol), which cannot split over a
    data axis of 2+; such dimensions are replicated instead, so the SAME
    jitted eval step runs under any mesh."""
    spec = [None, None, None]
    if shape[0] % mesh.shape[DATA_AXIS] == 0:
        spec[0] = DATA_AXIS
    if len(shape) >= 3 and shape[2] % mesh.shape[VOLUME_AXIS] == 0:
        spec[2] = VOLUME_AXIS
    return NamedSharding(mesh, P(*spec))


def image_spec() -> P:
    """[B, H, W, C] images / descriptors."""
    return P(DATA_AXIS, None, VOLUME_AXIS, None)


def disparity_map_spec() -> P:
    """[B, H, W] ground truth / estimated disparity."""
    return P(DATA_AXIS, None, VOLUME_AXIS)


def cost_volume_spec() -> P:
    """[B, D, H, W, C] cost volume: W sharded, D unsharded."""
    return P(DATA_AXIS, None, None, VOLUME_AXIS, None)


def similarity_spec() -> P:
    """[B, H, W, D] similarities: disparity-last, W sharded."""
    return P(DATA_AXIS, None, VOLUME_AXIS, None)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain(array, mesh: Mesh | None, spec: P):
    """``with_sharding_constraint`` that is a no-op without a mesh."""
    if mesh is None:
        return array
    return jax.lax.with_sharding_constraint(
        array, NamedSharding(mesh, spec))
