"""PFM (portable float map) disparity image IO.

The FlyingThings3D ground-truth disparities ship as PFM files. Semantics
match the reference's reader (reference ``flyingthings3d_dataset.py:60-89``):
header ``PF`` (color) / ``Pf`` (grayscale), a dimensions line, a scale line
whose sign encodes endianness (negative = little-endian), then raw floats
stored bottom-up (so the array is flipped vertically on read).

A writer is included for building synthetic test fixtures and for exporting
predictions.
"""

from __future__ import annotations

import re

import numpy as np


def read_pfm(filename: str) -> np.ndarray:
    """Reads a PFM file into an [H, W] or [H, W, 3] float32 array."""
    with open(filename, "rb") as handle:
        header = handle.readline().decode("utf-8").rstrip()
        if header == "PF":
            color = True
        elif header == "Pf":
            color = False
        else:
            raise ValueError(f"Not a PFM file: {filename}")
        dimensions = handle.readline().decode("utf-8")
        match = re.match(r"^(\d+)\s(\d+)\s*$", dimensions)
        if not match:
            raise ValueError(f"Malformed PFM header in {filename}")
        width, height = map(int, match.groups())
        scale = float(handle.readline().decode("utf-8").rstrip())
        endianness = "<" if scale < 0 else ">"
        data = np.fromfile(handle, endianness + "f")
    shape = (height, width, 3) if color else (height, width)
    data = data.reshape(shape)
    # PFM stores rows bottom-up.
    return np.ascontiguousarray(np.flipud(data)).astype(np.float32)


def write_pfm(filename: str, image: np.ndarray) -> None:
    """Writes an [H, W] or [H, W, 3] float array as a little-endian PFM."""
    image = np.asarray(image, dtype=np.float32)
    if image.ndim == 3 and image.shape[2] == 3:
        header = b"PF\n"
    elif image.ndim == 2:
        header = b"Pf\n"
    else:
        raise ValueError("PFM supports [H, W] or [H, W, 3] arrays only.")
    height, width = image.shape[:2]
    with open(filename, "wb") as handle:
        handle.write(header)
        handle.write(f"{width} {height}\n".encode("utf-8"))
        handle.write(b"-1.0\n")
        np.flipud(image).astype("<f").tofile(handle)
