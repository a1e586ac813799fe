"""Size adaptation: pad images to the network's minimum-size grid.

The PDS network only accepts heights/widths that are multiples of 64 (two
stride-2 embedding convs x four stride-2 hourglass levels). The reference
implements this as a *stateful* ``SizeAdapter`` object that zero-pads on the
**top and left** and remembers the pad amounts between ``pad`` and ``unpad``
calls (reference ``size_adapter.py:11-52``, pad sides at
``size_adapter.py:42-43``).

Under ``jax.jit`` hidden state is a bug factory, so here padding is a pair of
pure functions: pad amounts are recomputed from static shapes at trace time
and returned explicitly.
"""

from __future__ import annotations

import jax.numpy as jnp


def _ceil_to_multiple(size: int, multiple: int) -> int:
    return -(-size // multiple) * multiple


def pad_amounts(height: int, width: int, multiple: int = 64) -> tuple[int, int]:
    """Returns (pad_h, pad_w) needed to reach the next multiple of `multiple`."""
    return (
        _ceil_to_multiple(height, multiple) - height,
        _ceil_to_multiple(width, multiple) - width,
    )


def pad_to_multiple(image: jnp.ndarray, multiple: int = 64) -> jnp.ndarray:
    """Zero-pads the top and left of an NHWC image to a size multiple.

    Mirrors the reference's ``nn.ZeroPad2d((pad_w, 0, pad_h, 0))`` — i.e. the
    padding goes on the top of H and the left of W, NOT symmetrically
    (reference ``size_adapter.py:42-43``). The asymmetry is load-bearing: the
    matching stage shifts the right image rightwards, so left-column zero
    padding interacts with the disparity-0 boundary semantics.

    Args:
        image: ``[..., H, W, C]`` array (channels last).
        multiple: the size grid; 64 for the default PDS network.

    Returns:
        ``[..., H', W', C]`` with H', W' the closest larger multiples.
    """
    height, width = image.shape[-3], image.shape[-2]
    pad_h, pad_w = pad_amounts(height, width, multiple)
    if pad_h == 0 and pad_w == 0:
        return image
    pad_config = [(0, 0)] * (image.ndim - 3) + [(pad_h, 0), (pad_w, 0), (0, 0)]
    return jnp.pad(image, pad_config)


def unpad(output: jnp.ndarray, original_height: int, original_width: int,
          spatial_axes: tuple[int, int] = (-3, -2)) -> jnp.ndarray:
    """Crops a padded network output back to the original size.

    Inverse of :func:`pad_to_multiple`: drops the first ``pad_h`` rows /
    ``pad_w`` columns (reference ``size_adapter.py:45-52``).

    Args:
        output: array whose spatial dims sit at ``spatial_axes``.
        original_height, original_width: pre-padding spatial size.
        spatial_axes: which axes are (H, W). Defaults to channels-last
            convention; pass ``(-2, -1)`` for an ``[..., H, W]`` disparity map.
    """
    ax_h = spatial_axes[0] % output.ndim
    ax_w = spatial_axes[1] % output.ndim
    pad_h = output.shape[ax_h] - original_height
    pad_w = output.shape[ax_w] - original_width
    index = [slice(None)] * output.ndim
    index[ax_h] = slice(pad_h, None)
    index[ax_w] = slice(pad_w, None)
    return output[tuple(index)]
