"""Visualization smoke tests (reference ``test/test_visualization.py``)."""

import os

import numpy as np

from practicaldeepstereo_nips2018_tpu.utils import visualization


def test_overlay_image_with_binary_error():
    image = np.zeros((4, 5, 3), dtype=np.uint8)
    error = np.zeros((4, 5), dtype=np.uint8)
    error[1, 2] = 1
    overlaid = visualization.overlay_image_with_binary_error(image, error)
    # Error pixel is pure blue; others are washed out (//2 + 128).
    assert np.array_equal(overlaid[1, 2], [0, 0, 255])
    assert np.array_equal(overlaid[0, 0], [128, 128, 128])


def test_plot_points_on_background_bounds_contract():
    """Out-of-bounds points and non-color backgrounds raise (reference
    ``visualization.py:96-117``)."""
    import pytest
    background = np.zeros((4, 5, 3), dtype=np.uint8)
    painted = visualization.plot_points_on_background(
        np.array([[0, 0], [3, 4]]), background)
    assert np.array_equal(painted[3, 4], [0, 0, 255])
    assert np.array_equal(background[3, 4], [0, 0, 0])  # input untouched
    with pytest.raises(ValueError, match="boundaries"):
        visualization.plot_points_on_background(np.array([[4, 0]]),
                                                background)
    with pytest.raises(ValueError, match="boundaries"):
        visualization.plot_points_on_background(np.array([[0, -1]]),
                                                background)
    with pytest.raises(ValueError, match="height x width x color"):
        visualization.plot_points_on_background(np.array([[0, 0]]),
                                                np.zeros((4, 5)))
    # Empty point set: a no-op, not an error (no-error overlays are common).
    unpainted = visualization.plot_points_on_background(
        np.zeros((0, 2), dtype=int), background)
    assert np.array_equal(unpainted, background)


def test_logger_appends(tmp_path):
    log_file = str(tmp_path / "log.txt")
    logger = visualization.Logger(log_file)
    logger.log("first")
    logger.log("second")
    with open(log_file) as handle:
        assert handle.read() == "first\nsecond\n"


def test_save_image_and_matrix(tmp_path):
    image_file = str(tmp_path / "image.png")
    visualization.save_image(image_file,
                             np.random.randint(0, 255, (8, 10, 3)))
    assert os.path.getsize(image_file) > 0

    matrix = np.random.uniform(0, 50, (8, 10)).astype(np.float32)
    matrix[0, 0] = np.inf
    matrix_file = str(tmp_path / "matrix.png")
    visualization.save_matrix(matrix_file, matrix)
    assert os.path.getsize(matrix_file) > 0


def test_plot_losses_and_errors(tmp_path):
    plot_file = str(tmp_path / "plot.png")
    visualization.plot_losses_and_errors(plot_file, [3.0, 2.0, 1.5],
                                         [30.0, 20.0, 18.0])
    assert os.path.getsize(plot_file) > 0
