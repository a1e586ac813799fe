"""FlyingThings3D dataset: discovery, disparity statistics, splits, protocols.

Re-designs the reference's ``flyingthings3d_dataset.py`` with identical
selection semantics:

* deterministic example discovery by sorted directory walk
  (reference ``flyingthings3d_dataset.py:133-151,216-273``);
* per-example disparity statistics (integer min/max + 512-bin cumulative
  distribution) cached as ``.npz`` next to each ``.pfm``
  (reference ``flyingthings3d_dataset.py:170-213``) — with a fallback cache
  directory for read-only dataset mounts, and a batch precompute entry point
  so pod-scale runs don't hit the reference's slow first-scan path
  (``README.md:21`` warns about it);
* the hardcoded blacklist of 74 frames with rendering artifacts
  (reference ``flyingthings3d_dataset.py:16-57``), stored compactly as
  scene -> frame ranges;
* ``training_split``: seed(0) shuffle, TRAIN only, drop artifacts, drop
  examples with any disparity outside [0, maximum], first 500 examples ->
  validation (reference ``flyingthings3d_dataset.py:355-392``);
* ``small_training_split``: 3000 train / 300 validation, 256x256 central
  crop, maximum disparity 127 (reference ``:333-353``);
* ``benchmark_dataset``: TEST split, ground truth above 192 masked to inf;
  PSM protocol keeps every example, CRL drops examples with more than 25% of
  pixels above 300 px (reference ``:291-331``).
"""

from __future__ import annotations

import os
import random

import numpy as np

from practicaldeepstereo_nips2018_tpu.data import dataset
from practicaldeepstereo_nips2018_tpu.data import pfm
from practicaldeepstereo_nips2018_tpu.data import transforms

# Frames with rendering artifacts, found by the reference authors by visual
# inspection (reference flyingthings3d_dataset.py:16-57). Encoded compactly
# as scene path -> inclusive frame-index ranges; expands to the same 74
# left-image paths.
ARTIFACT_FRAMES = {
    "TRAIN/A/0011": (11, 15),
    "TRAIN/A/0534": (10, 13),
    "TRAIN/A/0690": (8, 9),
    "TRAIN/A/0705": (8, 15),
    "TRAIN/B/0386": (8, 15),
    "TRAIN/B/0576": (8, 15),
    "TRAIN/B/0609": (10, 11),
    "TRAIN/B/0643": (6, 15),
    "TRAIN/B/0653": (6, 12),
    "TRAIN/C/0511": (6, 15),
    "TRAIN/C/0599": (6, 15),
}


def _is_example_with_artifacts(path_to_left_image: str) -> bool:
    for scene, (first, last) in ARTIFACT_FRAMES.items():
        if scene in path_to_left_image:
            basename = os.path.basename(path_to_left_image)
            frame = int(os.path.splitext(basename)[0])
            if first <= frame <= last:
                return True
    return False


# ---------------------------------------------------------------------------
# Disparity statistics cache
# ---------------------------------------------------------------------------


def _compute_cumulative_distribution(disparity_image: np.ndarray,
                                     minimum_disparity: int,
                                     maximum_disparity: int) -> np.ndarray:
    """512-bin cumulative distribution in percent; element n holds the
    percentage of pixels with disparity < n+1 (out-of-range disparities fold
    into the boundary bins; reference ``flyingthings3d_dataset.py:176-182``).
    """
    bins = ([min(minimum_disparity, 0)] + list(range(1, 512)) +
            [max(maximum_disparity, 512)])
    histogram = np.histogram(disparity_image.reshape(-1), bins=bins)[0]
    histogram = histogram / histogram.sum()
    return np.cumsum(histogram) * 100.0


def _statistic_filename(disparity_image_file: str,
                        cache_folder: str | None) -> str:
    base = os.path.splitext(disparity_image_file)[0] + ".npz"
    if cache_folder is None:
        return base
    return os.path.join(cache_folder,
                        base.replace(os.sep, "__").lstrip("_"))


def compute_disparity_statistic(disparity_image_file: str) -> dict:
    disparity_image = pfm.read_pfm(disparity_image_file)
    minimum_disparity = int(np.floor(disparity_image.min()))
    maximum_disparity = int(np.ceil(disparity_image.max()))
    return {
        "minimum_disparity": minimum_disparity,
        "maximum_disparity": maximum_disparity,
        "cumulative_distribution": _compute_cumulative_distribution(
            disparity_image, minimum_disparity, maximum_disparity),
    }


def _load_or_compute_statistic(disparity_image_file: str,
                               cache_folder: str | None) -> dict:
    statistic_file = _statistic_filename(disparity_image_file, cache_folder)
    if os.path.isfile(statistic_file):
        content = np.load(statistic_file)
        return {
            "minimum_disparity": int(content["minimum_disparity"]),
            "maximum_disparity": int(content["maximum_disparity"]),
            "cumulative_distribution": content["cumulative_distribution"],
        }
    statistic = compute_disparity_statistic(disparity_image_file)
    try:
        np.savez(statistic_file, **statistic)
    except OSError:
        pass  # read-only dataset mount and no cache folder: recompute later.
    return statistic


# ---------------------------------------------------------------------------
# Example discovery
# ---------------------------------------------------------------------------


def _folders_with_left_images(images_folder: str) -> list[str]:
    folders = [
        walk_entry[0] for walk_entry in os.walk(images_folder)
        if walk_entry[2] and "left" in walk_entry[0]
    ]
    return sorted(folders)


def _scan_missing_statistics_native(missing_files: list[str],
                                    cache_folder: str | None) -> set[str]:
    """Computes statistics for ``missing_files`` with the C++ scanner
    (``native/pfm_stats.cpp``) and writes the .npz caches. Returns the set
    of files successfully scanned (others fall back to the Python path)."""
    from practicaldeepstereo_nips2018_tpu.data import native
    results = native.scan_disparity_statistics(missing_files)
    if results is None:
        return set()
    minimums, maximums, cumulatives, status = results
    done = set()
    for index, disparity_file in enumerate(missing_files):
        if status[index] != 0:
            continue
        statistic_file = _statistic_filename(disparity_file, cache_folder)
        try:
            np.savez(statistic_file,
                     minimum_disparity=int(minimums[index]),
                     maximum_disparity=int(maximums[index]),
                     cumulative_distribution=cumulatives[index]
                     .astype(np.float64))
        except OSError:
            continue
        done.add(disparity_file)
    return done


def find_examples(dataset_folder: str,
                  cache_folder: str | None = None,
                  use_native_scanner: bool = True) -> list[dict]:
    """Returns FlyingThings3D example records in deterministic order.

    Args:
        dataset_folder: folder containing ``frames_cleanpass`` (left/right
            images) and ``disparity`` (PFM ground truth).
        cache_folder: optional directory for disparity-statistic files
            (default: next to each PFM, like the reference).
        use_native_scanner: batch-compute missing statistics with the
            multithreaded C++ scanner before falling back to Python.

    Each record carries image/disparity paths plus ``minimum_disparity``,
    ``maximum_disparity`` and ``cumulative_distribution_from_0_to_511``.
    """
    dataset_folder = os.path.abspath(dataset_folder)
    images_folder = os.path.join(dataset_folder, "frames_cleanpass")
    disparity_folder = os.path.join(dataset_folder, "disparity")
    if cache_folder is not None:
        os.makedirs(cache_folder, exist_ok=True)

    records = []
    for folder in _folders_with_left_images(images_folder):
        png_files = sorted(
            name for name in os.listdir(folder) if name.endswith(".png"))
        for basename in png_files:
            left_image_file = os.path.join(folder, basename)
            right_image_file = os.path.join(
                os.path.dirname(os.path.dirname(left_image_file)), "right",
                basename)
            relative = os.path.relpath(left_image_file, images_folder)
            disparity_image_file = os.path.join(
                disparity_folder,
                os.path.splitext(relative)[0] + ".pfm")
            records.append((left_image_file, right_image_file,
                            disparity_image_file))

    if use_native_scanner:
        missing = [
            disparity for _, _, disparity in records
            if not os.path.isfile(_statistic_filename(disparity,
                                                      cache_folder))
        ]
        if missing:
            _scan_missing_statistics_native(missing, cache_folder)

    examples = []
    for left_image_file, right_image_file, disparity_image_file in records:
        statistic = _load_or_compute_statistic(disparity_image_file,
                                               cache_folder)
        examples.append({
            "left": {
                "image": left_image_file,
                "disparity_image": disparity_image_file,
            },
            "right": {
                "image": right_image_file
            },
            "minimum_disparity": statistic["minimum_disparity"],
            "maximum_disparity": statistic["maximum_disparity"],
            "cumulative_distribution_from_0_to_511":
                statistic["cumulative_distribution"],
        })
    return examples


def precompute_disparity_statistics(dataset_folder: str,
                                    cache_folder: str | None = None) -> int:
    """Offline statistics precompute (avoids the first-run stall the
    reference README warns about). Returns the number of examples scanned."""
    return len(find_examples(dataset_folder, cache_folder))


# ---------------------------------------------------------------------------
# Filters and splits
# ---------------------------------------------------------------------------


def _split_training_test(examples: list[dict]):
    training = [e for e in examples if "TRAIN" in e["left"]["image"]]
    test = [e for e in examples if "TEST" in e["left"]["image"]]
    return training, test


def _filter_disparity_range(examples: list[dict],
                            maximum_disparity: float) -> list[dict]:
    return [
        e for e in examples
        if (e["maximum_disparity"] <= maximum_disparity
            and e["minimum_disparity"] >= 0)
    ]


def _filter_crl_large_disparities(
        examples: list[dict], maximum_percentage_of_large_disparities: float,
        large_disparity: int) -> list[dict]:
    return [
        e for e in examples
        if (100.0 - e["cumulative_distribution_from_0_to_511"]
            [large_disparity]) < maximum_percentage_of_large_disparities
    ]


class FlyingThings3D(dataset.Dataset):
    """FlyingThings3D stereo dataset."""

    def _read_disparity_image(self, example_files: dict) -> np.ndarray:
        return pfm.read_pfm(example_files["left"]["disparity_image"])

    @classmethod
    def training_split(cls,
                       dataset_folder: str,
                       number_of_validation_examples: int = 500,
                       maximum_disparity: float = 255,
                       cache_folder: str | None = None):
        """Returns (training, validation) datasets; selection rules match the
        reference (``flyingthings3d_dataset.py:355-392``): TRAIN examples
        without rendering artifacts whose disparities all lie in
        [0, maximum_disparity], seed(0)-shuffled, first
        ``number_of_validation_examples`` to validation."""
        examples = find_examples(dataset_folder, cache_folder)
        random.seed(0)
        random.shuffle(examples)
        examples = _split_training_test(examples)[0]
        examples = [
            e for e in examples
            if not _is_example_with_artifacts(e["left"]["image"])
        ]
        examples = _filter_disparity_range(examples, maximum_disparity)
        validation, training = cls(examples).split_in_two(
            number_of_validation_examples)
        return training, validation

    @classmethod
    def small_training_split(cls,
                             dataset_folder: str,
                             maximum_disparity: float = 127,
                             number_of_validation_examples: int = 300,
                             number_of_training_examples: int = 3000,
                             height: int = 256,
                             width: int = 256,
                             cache_folder: str | None = None):
        """Small split for tuning (reference ``:333-353``): 3000/300 examples,
        central crops, maximum disparity 127."""
        training, validation = cls.training_split(
            dataset_folder,
            number_of_validation_examples=number_of_validation_examples,
            maximum_disparity=maximum_disparity,
            cache_folder=cache_folder)
        training = training.split_in_two(number_of_training_examples)[0]
        crop = [transforms.CentralCrop(height, width)]
        training.append_transformers(crop)
        validation.append_transformers(crop)
        return training, validation

    @classmethod
    def benchmark_dataset(cls,
                          dataset_folder: str,
                          is_psm_protocol: bool,
                          maximum_disparity: float = 192,
                          maximum_percentage_of_large_disparities: float = 25.0,
                          large_disparity: int = 300,
                          cache_folder: str | None = None):
        """Returns the TEST-split benchmark dataset under the PSM or CRL
        protocol (reference ``:291-331``): both mask ground truth above
        ``maximum_disparity`` to inf; CRL additionally drops examples where
        more than 25% of pixels exceed 300 px."""
        examples = find_examples(dataset_folder, cache_folder)
        examples = _split_training_test(examples)[1]
        mask = [transforms.MaskLargeDisparities(maximum_disparity)]
        if is_psm_protocol:
            return cls(examples, mask)
        examples = _filter_crl_large_disparities(
            examples, maximum_percentage_of_large_disparities,
            large_disparity)
        return cls(examples, mask)
