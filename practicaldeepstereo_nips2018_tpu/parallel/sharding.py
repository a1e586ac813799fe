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


def spans_processes(mesh: Mesh) -> bool:
    """True when the mesh's devices belong to more than one process (a
    cross-host mesh: host-local batches are only a SHARD of the global
    batch and must be assembled with :func:`global_batch_from_host_local`,
    never ``device_put`` directly)."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def axis_spans_processes(mesh: Mesh, axis_name: str) -> bool:
    """True when moving along ``axis_name`` (at any fixed position on the
    other axes) crosses a process boundary.

    Decides the cross-process batch-assembly strategy: a ``data`` axis
    spanning processes pairs with per-host example shards
    (:func:`global_batch_from_host_local`); a ``volume`` axis spanning
    processes W-slices every example across hosts, so every host must load
    the full batch (:func:`global_batch_from_full`) — and the hourglass
    halo exchanges ride DCN instead of staying host-local."""
    import numpy as np
    axis_index = list(mesh.axis_names).index(axis_name)
    along_axis = np.moveaxis(mesh.devices, axis_index, 0)
    columns = along_axis.reshape(along_axis.shape[0], -1)
    return any(
        len({device.process_index for device in columns[:, position]}) > 1
        for position in range(columns.shape[1]))


def global_batch_from_host_local(mesh: Mesh,
                                 host_local: "np.ndarray") -> jax.Array:
    """Assembles the GLOBAL batch array from this host's loader shard.

    Under a cross-process mesh each host's input pipeline yields a disjoint
    per-host batch (``data/loader.py`` host sharding). ``jax.device_put``
    would treat that per-host array as the full global value — every host
    feeding different data into what XLA assumes is one replicated tensor,
    silently diverging. The correct assembly is
    ``jax.make_array_from_process_local_data``: the global batch dimension is
    ``per_host_batch * process_count`` and each process contributes exactly
    the rows its addressable devices own.

    Requires the global batch to actually shard over the ``data`` axis
    (otherwise every device would need every example, which per-host loading
    cannot provide) — a per-host batch size of
    ``mesh.data_axis / process_count`` per device multiple satisfies it.
    """
    import numpy as np
    process_count = len({d.process_index for d in mesh.devices.flat})
    host_local = np.asarray(host_local)
    global_shape = ((host_local.shape[0] * process_count,)
                    + host_local.shape[1:])
    placement = compatible_batch_sharding(mesh, global_shape)
    if placement.spec[0] is None:
        raise ValueError(
            "multi-host mesh training needs the global batch "
            f"(= per-host {host_local.shape[0]} x {process_count} processes "
            f"= {global_shape[0]}) to divide the mesh data axis "
            f"({mesh.shape[DATA_AXIS]}); raise the per-host batch size")
    return jax.make_array_from_process_local_data(placement, host_local,
                                                  global_shape)


def global_batch_from_full(mesh: Mesh, full_batch: "np.ndarray") -> jax.Array:
    """Assembles the global batch when EVERY host holds the FULL batch.

    Required when the ``volume`` axis crosses processes: each host then owns
    a W-slice of every example, which a per-example host-sharded loader
    cannot provide — so every host's input pipeline must yield the same
    complete global batch (deterministic loaders, no host sharding) and each
    process contributes the slices its addressable devices own."""
    import numpy as np
    full_batch = np.asarray(full_batch)
    placement = compatible_batch_sharding(mesh, full_batch.shape)
    return jax.make_array_from_callback(
        full_batch.shape, placement,
        lambda index: full_batch[index])


def image_spec() -> P:
    """[B, H, W, C] images / descriptors."""
    return P(DATA_AXIS, None, VOLUME_AXIS, None)


def disparity_map_spec() -> P:
    """[B, H, W] ground truth / estimated disparity."""
    return P(DATA_AXIS, None, VOLUME_AXIS)


def cost_volume_spec() -> P:
    """[B, D, H, W, C] cost volume: W sharded, D unsharded."""
    return P(DATA_AXIS, None, None, VOLUME_AXIS, None)


def folded_volume_spec() -> P:
    """[B, H, W, D*C] depth-FOLDED cost volume (the layout the network
    actually executes, ``ops/folded3d.py``): W over ``volume``, the folded
    (disparity, channel) lane axis unsharded."""
    return P(DATA_AXIS, None, VOLUME_AXIS, None)


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
