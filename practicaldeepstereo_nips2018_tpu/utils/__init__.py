"""Utilities: logging and visualization."""

from practicaldeepstereo_nips2018_tpu.utils.visualization import (
    Logger,
    save_image,
    save_matrix,
    overlay_image_with_binary_error,
    plot_losses_and_errors,
)

__all__ = [
    "Logger",
    "save_image",
    "save_matrix",
    "overlay_image_with_binary_error",
    "plot_losses_and_errors",
]
