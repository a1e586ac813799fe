"""Observability: text logger, image/matrix dumps, training plots.

Re-designs the reference's ``visualization.py`` on numpy (channels-last)
arrays:

* :class:`Logger` — append-a-line text log (same output format; O(1) appends
  instead of the reference's rewrite-the-whole-file-per-line,
  ``visualization.py:138-153``).
* :func:`save_image` — [H, W, 3] byte image to PNG (``:35-54``).
* :func:`save_matrix` — colormapped disparity map with colorbar; inf-masked;
  value range either given or the 0.001/0.999 quantiles (``:57-91``).
* :func:`overlay_image_with_binary_error` — washed-out image with error
  pixels in blue (``:94-135``).
* :func:`plot_losses_and_errors` — dual-axis loss (blue, left) / validation
  error (red, right) per-epoch plot (``:156-188``).
"""

from __future__ import annotations

import os

import numpy as np

import matplotlib
matplotlib.use("Agg")
from matplotlib import pyplot as plt  # noqa: E402
from mpl_toolkits import axes_grid1  # noqa: E402


class Logger:
    """Appends timestamped-free text lines to a log file."""

    def __init__(self, filename: str):
        self._filename = filename

    def log(self, text: str) -> None:
        with open(self._filename, "a") as handle:
            handle.write(text + "\n")


class NullLogger:
    """Single-writer discipline: non-zero hosts log into the void (otherwise
    every process of a pod appends interleaved lines to the same log.txt)."""

    def log(self, text: str) -> None:
        pass


def _add_scaled_colorbar(plot, aspect=20, pad_fraction=0.5, **kwargs):
    divider = axes_grid1.make_axes_locatable(plot.axes)
    width = axes_grid1.axes_size.AxesY(plot.axes, aspect=1.0 / aspect)
    pad = axes_grid1.axes_size.Fraction(pad_fraction, width)
    current_axis = plt.gca()
    cax = divider.append_axes("right", size=width, pad=pad)
    plt.sca(current_axis)
    return plot.axes.figure.colorbar(plot, cax=cax, **kwargs)


def save_image(filename: str, image: np.ndarray) -> None:
    """Saves an [H, W, 3] image (0..255) to a PNG."""
    figure = plt.figure()
    plot = plt.imshow(np.asarray(image).astype(np.uint8))
    plot.axes.get_xaxis().set_visible(False)
    plot.axes.get_yaxis().set_visible(False)
    figure.savefig(filename, bbox_inches="tight", dpi=200)
    plt.close(figure)


def save_matrix(filename: str,
                matrix: np.ndarray,
                minimum_value: float | None = None,
                maximum_value: float | None = None,
                colormap: str = "magma",
                is_colorbar: bool = True) -> None:
    """Saves an [H, W] matrix (possibly containing inf) as a colormapped PNG.

    Values outside [minimum_value, maximum_value] show white; missing bounds
    default to the 0.001 / 0.999 quantiles of the finite values.
    """
    matrix = np.asarray(matrix)
    figure = plt.figure()
    finite_mask = ~np.isinf(matrix)
    if minimum_value is None:
        minimum_value = np.quantile(matrix[finite_mask], 0.001)
    if maximum_value is None:
        maximum_value = np.quantile(matrix[finite_mask], 0.999)
    plot = plt.imshow(matrix, cmap=colormap, vmin=minimum_value,
                      vmax=maximum_value)
    if is_colorbar:
        _add_scaled_colorbar(plot)
    plot.axes.get_xaxis().set_visible(False)
    plot.axes.get_yaxis().set_visible(False)
    figure.savefig(filename, bbox_inches="tight", dpi=200)
    plt.close(figure)


def plot_points_on_background(points_coordinates: np.ndarray,
                              background: np.ndarray,
                              points_color=(0, 0, 255)) -> np.ndarray:
    """Returns ``background`` with the given pixels painted ``points_color``.

    Channels-last re-implementation of the reference's
    ``visualization.py:96-117``, keeping its validation contract: the
    background must be a color image, and every point must lie inside it
    (out-of-bounds coordinates raise ``ValueError`` instead of silently
    wrapping through negative indexing).

    Args:
        points_coordinates: [N, 2] array of (y, x) coordinates.
        background: [H, W, 3] byte image.
        points_color: (red, green, blue) byte color.
    """
    background = np.asarray(background)
    if not (background.ndim == 3 and background.shape[2] == 3):
        raise ValueError("background should be (height x width x color).")
    height, width = background.shape[:2]
    with_points = background.copy()
    points_coordinates = np.asarray(points_coordinates).reshape(-1, 2)
    if points_coordinates.size:
        y, x = points_coordinates[:, 0], points_coordinates[:, 1]
        if not (y.min() >= 0 and x.min() >= 0 and y.max() < height
                and x.max() < width):
            raise ValueError(
                'points coordinates are outside of "background" boundaries.')
        with_points[y, x] = np.asarray(points_color, dtype=background.dtype)
    return with_points


def overlay_image_with_binary_error(color_image: np.ndarray,
                                    binary_error: np.ndarray) -> np.ndarray:
    """Returns the [H, W, 3] image washed out, with error pixels in blue.

    Args:
        color_image: [H, W, 3] byte image.
        binary_error: [H, W] boolean/byte mask; nonzero marks an error.
    """
    washed_out = np.asarray(color_image).astype(np.uint8) // 2 + 128
    points = np.argwhere(np.asarray(binary_error) != 0)
    return plot_points_on_background(points, washed_out)


def plot_losses_and_errors(filename: str,
                           losses: list,
                           errors: list,
                           right_y_axis_label: str = "Validation error, [%]"
                           ) -> None:
    """Dual-axis per-epoch training plot: loss (blue, left axis) and
    validation error (red, right axis), smallest values in the legend."""
    epochs = range(1, len(losses) + 1)
    figure, loss_axis = plt.subplots()
    loss_plot = loss_axis.plot(
        epochs, losses, "bs-",
        label=f"Training loss (smallest {min(losses):.3f})")[0]
    loss_axis.set_ylabel("Training loss", color="blue")
    loss_axis.set_xlabel("Epoch")
    error_axis = loss_axis.twinx()
    error_plot = error_axis.plot(
        epochs, errors, "ro--",
        label=f"Validation error (smallest {min(errors):.3f})")[0]
    error_axis.set_ylabel(right_y_axis_label, color="red")
    error_axis.legend(handles=[loss_plot, error_plot])
    figure.savefig(filename, bbox_inches="tight")
    plt.close(figure)
