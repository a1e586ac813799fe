"""Numerics kernel layer: pure-jnp / Pallas ops used by the PDS model."""

from practicaldeepstereo_nips2018_tpu.ops.pad import (
    pad_to_multiple,
    unpad,
)
from practicaldeepstereo_nips2018_tpu.ops.subpixel import subpixel_map
from practicaldeepstereo_nips2018_tpu.ops.loss import subpixel_cross_entropy
from practicaldeepstereo_nips2018_tpu.ops.errors import (
    absolute_error,
    n_pixels_error,
)

__all__ = [
    "pad_to_multiple",
    "unpad",
    "subpixel_map",
    "subpixel_cross_entropy",
    "absolute_error",
    "n_pixels_error",
]
