"""Synthetic mini-dataset builders for tests.

Generates tiny FlyingThings3D- and KITTI-shaped directory trees with
programmatic images, mirroring the *properties* the reference's checked-in
fixture data exercises (reference ``test/data``): TRAIN/TEST scene splits, an
example exceeding the training disparity filter, a TEST example that the CRL
protocol drops, KITTI-2012 reflective ground-truth merging, benchmark sets
without ground truth.
"""

from __future__ import annotations

import os

import cv2
import numpy as np

from practicaldeepstereo_nips2018_tpu.data import pfm

HEIGHT, WIDTH = 32, 48


def _write_image(path: str, seed: int) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.RandomState(seed)
    image = rng.randint(0, 255, (HEIGHT, WIDTH, 3), dtype=np.uint8)
    cv2.imwrite(path, image)


def _write_disparity_pfm(path: str, value: float, seed: int,
                         fraction_large: float = 0.0,
                         large_value: float = 400.0) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.RandomState(seed)
    disparity = np.full((HEIGHT, WIDTH), value, dtype=np.float32)
    disparity += rng.uniform(0, 1, disparity.shape).astype(np.float32)
    if fraction_large > 0:
        mask = rng.uniform(size=disparity.shape) < fraction_large
        disparity[mask] = large_value
    pfm.write_pfm(path, disparity)


def make_flyingthings3d_tree(root: str) -> str:
    """Builds a 4-example FlyingThings3D tree.

    TRAIN/A/0000/0006: disparities ~40        (survives filters <= 100)
    TRAIN/B/0749/0015: disparities ~150       (dropped by max-disparity-100)
    TEST/A/0000/0006:  disparities ~40        (kept by PSM and CRL)
    TEST/B/0149/0015:  40% of pixels at 400   (kept by PSM, dropped by CRL)
    """
    spec = [
        ("TRAIN/A/0000", "0006", 40.0, 0.0),
        ("TRAIN/B/0749", "0015", 150.0, 0.0),
        ("TEST/A/0000", "0006", 40.0, 0.0),
        ("TEST/B/0149", "0015", 40.0, 0.4),
    ]
    for index, (scene, frame, disparity, fraction_large) in enumerate(spec):
        images = os.path.join(root, "frames_cleanpass", scene)
        _write_image(os.path.join(images, "left", frame + ".png"), 10 + index)
        _write_image(os.path.join(images, "right", frame + ".png"),
                     20 + index)
        _write_disparity_pfm(
            os.path.join(root, "disparity", scene, "left", frame + ".pfm"),
            disparity, 30 + index, fraction_large)
    return root


def make_kitti_tree(root: str) -> str:
    """Builds a 4-example KITTI tree (2 x 2012 + 2 x 2015) plus 2-example
    benchmark (testing) sets; 2012 example 0 has a reflective ground-truth
    image overriding part of the base ground truth."""
    k2012 = os.path.join(root, "data_stereo_flow")
    k2015 = os.path.join(root, "data_scene_flow")
    rng = np.random.RandomState(0)
    for index in range(2):
        basename = f"{index:06d}_10.png"
        for split in ("training", "testing"):
            _write_image(os.path.join(k2012, split, "colored_0", basename),
                         40 + index)
            _write_image(os.path.join(k2012, split, "colored_1", basename),
                         50 + index)
            _write_image(os.path.join(k2015, split, "image_2", basename),
                         60 + index)
            _write_image(os.path.join(k2015, split, "image_3", basename),
                         70 + index)
        # 8-bit disparity maps with zeros marking unknown pixels.
        for folder, seed in ((os.path.join(k2012, "training", "disp_occ"),
                              80 + index),
                             (os.path.join(k2015, "training", "disp_occ_0"),
                              90 + index)):
            os.makedirs(folder, exist_ok=True)
            disparity = rng.randint(0, 100, (HEIGHT, WIDTH), dtype=np.uint8)
            disparity[:4] = 0  # unknown band
            cv2.imwrite(os.path.join(folder, basename), disparity)
        refl_folder = os.path.join(k2012, "training", "disp_refl_occ")
        os.makedirs(refl_folder, exist_ok=True)
        reflective = np.zeros((HEIGHT, WIDTH), dtype=np.uint8)
        if index == 0:
            reflective[8:12, :] = 77  # overrides base ground truth here
        cv2.imwrite(os.path.join(refl_folder, basename), reflective)
    return root
