"""KITTI 2012 + 2015 stereo dataset.

Re-designs the reference's ``kitti_dataset.py``: a combined KITTI-2012
(``data_stereo_flow``) and KITTI-2015 (``data_scene_flow``) dataset with

* sequentially numbered ``{index:06d}_10.png`` example discovery
  (reference ``kitti_dataset.py:41-67``);
* ground-truth merging for KITTI-2012: reflective-surface disparities
  override the base occluded ground truth where nonzero
  (reference ``kitti_dataset.py:90-96``);
* zeros meaning "unknown" mapped to inf (reference ``:97-99``);
* fixed seed(0) shuffled split with 58 validation examples
  (reference ``:102-142``);
* benchmark test sets without ground truth (reference ``:144-172``).

Disparity decoding: the reference reads the 16-bit KITTI disparity PNGs with
``cv2.imread(file, 0)`` — 8-bit grayscale — which collapses the uint16/256
encoding to integer-pixel disparities (reference ``kitti_dataset.py:88-89``).
That loses the sub-pixel fraction. This implementation defaults to the
reference's behavior for parity, with ``use_sub_pixel_ground_truth=True``
available to decode the full uint16/256 precision.

Note the maximum disparity in the dataset is 231 px (reference ``:79``).
"""

from __future__ import annotations

import os
import random

import cv2
import numpy as np

from practicaldeepstereo_nips2018_tpu.data import dataset


def _find_examples(left_images_folder: str,
                   right_images_folder: str,
                   disparity_images_folder: str | None = None,
                   reflective_disparity_images_folder: str | None = None
                   ) -> list[dict]:
    """Returns examples in deterministic index order."""
    examples = []
    example_index = 0
    while True:
        basename = f"{example_index:06d}_10.png"
        left_image_file = os.path.join(left_images_folder, basename)
        if not os.path.isfile(left_image_file):
            break
        disparity_image_file = None
        reflective_disparity_image_file = None
        if disparity_images_folder is not None:
            disparity_image_file = os.path.join(disparity_images_folder,
                                                basename)
        if reflective_disparity_images_folder is not None:
            reflective_disparity_image_file = os.path.join(
                reflective_disparity_images_folder, basename)
        examples.append({
            "left": {
                "image": left_image_file,
                "disparity_image": disparity_image_file,
                "reflective_disparity_image":
                    reflective_disparity_image_file,
            },
            "right": {
                "image": os.path.join(right_images_folder, basename)
            },
        })
        example_index += 1
    return examples


class Kitti(dataset.Dataset):
    """Combined KITTI-2012 / KITTI-2015 stereo dataset."""

    use_sub_pixel_ground_truth: bool = False

    def _read_single_disparity(self, filename: str) -> np.ndarray:
        if self.use_sub_pixel_ground_truth:
            raw = cv2.imread(filename, cv2.IMREAD_UNCHANGED)
            return raw.astype(np.float32) / 256.0
        return cv2.imread(filename, cv2.IMREAD_GRAYSCALE).astype(np.float32)

    def _read_disparity_image(self, example_files: dict):
        disparity_image_file = example_files["left"]["disparity_image"]
        if disparity_image_file is None:
            return None
        disparity = self._read_single_disparity(disparity_image_file)
        reflective_file = example_files["left"].get(
            "reflective_disparity_image")
        if reflective_file is not None:
            reflective = self._read_single_disparity(reflective_file)
            available = reflective != 0
            disparity[available] = reflective[available]
        # Zeros encode "unknown disparity" in KITTI ground truth.
        disparity[disparity == 0] = np.inf
        return disparity

    @classmethod
    def training_split(cls, dataset_folder: str,
                       number_of_validation_examples: int = 58):
        """Returns (training, validation); always the same seed(0) split
        (reference ``kitti_dataset.py:102-142``)."""
        examples = _find_examples(
            left_images_folder=os.path.join(
                dataset_folder, "data_stereo_flow", "training", "colored_0"),
            right_images_folder=os.path.join(
                dataset_folder, "data_stereo_flow", "training", "colored_1"),
            disparity_images_folder=os.path.join(
                dataset_folder, "data_stereo_flow", "training", "disp_occ"),
            reflective_disparity_images_folder=os.path.join(
                dataset_folder, "data_stereo_flow", "training",
                "disp_refl_occ"))
        examples += _find_examples(
            left_images_folder=os.path.join(
                dataset_folder, "data_scene_flow", "training", "image_2"),
            right_images_folder=os.path.join(
                dataset_folder, "data_scene_flow", "training", "image_3"),
            disparity_images_folder=os.path.join(
                dataset_folder, "data_scene_flow", "training", "disp_occ_0"))
        random.seed(0)
        random.shuffle(examples)
        validation, training = cls(examples).split_in_two(
            number_of_validation_examples)
        return training, validation

    @classmethod
    def kitti2015_benchmark(cls, dataset_folder: str):
        return cls(_find_examples(
            left_images_folder=os.path.join(
                dataset_folder, "data_scene_flow", "testing", "image_2"),
            right_images_folder=os.path.join(
                dataset_folder, "data_scene_flow", "testing", "image_3")))

    @classmethod
    def kitti2012_benchmark(cls, dataset_folder: str):
        return cls(_find_examples(
            left_images_folder=os.path.join(
                dataset_folder, "data_stereo_flow", "testing", "colored_0"),
            right_images_folder=os.path.join(
                dataset_folder, "data_stereo_flow", "testing", "colored_1")))
