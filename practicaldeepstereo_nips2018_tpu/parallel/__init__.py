"""Parallelism: device meshes, sharding rules, distributed runtime init."""

from practicaldeepstereo_nips2018_tpu.parallel.mesh import (
    DATA_AXIS,
    VOLUME_AXIS,
    make_mesh,
    single_device_mesh,
)
from practicaldeepstereo_nips2018_tpu.parallel import sharding
from practicaldeepstereo_nips2018_tpu.parallel.runtime import (
    initialize_distributed,
    topology,
)

__all__ = [
    "DATA_AXIS",
    "VOLUME_AXIS",
    "make_mesh",
    "single_device_mesh",
    "sharding",
    "initialize_distributed",
    "topology",
]
