"""Device meshes for data-parallel + cost-volume-parallel execution.

The reference has NO distributed code (single GPU, batch 1, no NCCL/MPI —
see SURVEY.md §2.5). The TPU framework scales along two mesh axes:

* ``data``   — batch sharding (data parallelism; gradients all-reduce over
  this axis automatically under GSPMD).
* ``volume`` — the cost-volume/"context parallel" axis: the W spatial
  dimension of images, descriptors and the 5-D cost volume is sharded across
  it, so the 3D hourglass convolutions run with compiler-inserted halo
  exchanges over ICI and the estimator/loss softmax over disparity stays
  local (disparity is unsharded, W is).

Mesh construction prefers putting ``volume`` on the innermost (fastest ICI)
axis of the physical topology via ``jax.experimental.mesh_utils``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

DATA_AXIS = "data"
VOLUME_AXIS = "volume"


def make_mesh(data: int | None = None,
              volume: int = 1,
              devices=None) -> Mesh:
    """Builds a ``(data, volume)`` mesh.

    Args:
        data: size of the data axis; default = all devices / volume.
        volume: size of the cost-volume sharding axis.
        devices: explicit device list (default ``jax.devices()``).
    """
    if devices is None:
        devices = jax.devices()
    total = len(devices)
    if data is None:
        if total % volume:
            raise ValueError(
                f"{total} devices not divisible by volume={volume}")
        data = total // volume
    if data * volume != total:
        devices = devices[:data * volume]
    try:
        device_array = mesh_utils.create_device_mesh(
            (data, volume), devices=devices)
    except (ValueError, AssertionError):
        device_array = np.asarray(devices).reshape(data, volume)
    return Mesh(device_array, (DATA_AXIS, VOLUME_AXIS))


def single_device_mesh() -> Mesh:
    """Degenerate 1x1 mesh (useful to exercise the sharded code path on one
    chip)."""
    return make_mesh(data=1, volume=1, devices=jax.devices()[:1])
