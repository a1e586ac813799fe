"""Native C++ data-plane tests: PFM decode + statistics parity vs Python.

Skipped cleanly when the g++ toolchain is unavailable.
"""

import numpy as np
import pytest

from practicaldeepstereo_nips2018_tpu.data import native, pfm
from practicaldeepstereo_nips2018_tpu.data import flyingthings3d

requires_native = pytest.mark.skipif(not native.available(),
                                     reason="native library unavailable")


@requires_native
def test_native_pfm_read_matches_python(tmp_path):
    rng = np.random.RandomState(0)
    image = rng.uniform(-5, 400, (17, 23)).astype(np.float32)
    path = str(tmp_path / "x.pfm")
    pfm.write_pfm(path, image)
    python_read = pfm.read_pfm(path)
    native_read = native.read_pfm(path)
    assert native_read.shape == python_read.shape
    assert np.array_equal(native_read, python_read)


@requires_native
def test_native_statistics_match_python(tmp_path):
    rng = np.random.RandomState(1)
    paths = []
    expected = []
    for index in range(4):
        disparity = rng.uniform(0, 600 if index == 3 else 200,
                                (31, 29)).astype(np.float32)
        if index == 2:
            disparity -= 20.0  # negative disparities hit the low bin
        path = str(tmp_path / f"{index}.pfm")
        pfm.write_pfm(path, disparity)
        paths.append(path)
        expected.append(
            flyingthings3d.compute_disparity_statistic(path))

    minimums, maximums, cumulatives, status = (
        native.scan_disparity_statistics(paths, threads=3))
    assert np.all(status == 0)
    for index in range(4):
        assert int(minimums[index]) == expected[index]["minimum_disparity"]
        assert int(maximums[index]) == expected[index]["maximum_disparity"]
        assert np.allclose(cumulatives[index],
                           expected[index]["cumulative_distribution"],
                           atol=1e-3)


@requires_native
def test_native_scan_reports_failures(tmp_path):
    good = str(tmp_path / "ok.pfm")
    pfm.write_pfm(good, np.ones((4, 4), np.float32))
    bad = str(tmp_path / "missing.pfm")
    minimums, maximums, cumulatives, status = (
        native.scan_disparity_statistics([good, bad]))
    assert status[0] == 0
    assert status[1] == -1


@requires_native
def test_find_examples_uses_native_scanner(tmp_path):
    from tests import fixtures
    root = fixtures.make_flyingthings3d_tree(str(tmp_path / "ft3d"))
    examples = flyingthings3d.find_examples(root, use_native_scanner=True)
    assert len(examples) == 4
    # Compare against the Python scan path on a fresh tree.
    root2 = fixtures.make_flyingthings3d_tree(str(tmp_path / "ft3d2"))
    examples2 = flyingthings3d.find_examples(root2,
                                             use_native_scanner=False)
    for native_example, python_example in zip(examples, examples2):
        assert (native_example["minimum_disparity"] ==
                python_example["minimum_disparity"])
        assert (native_example["maximum_disparity"] ==
                python_example["maximum_disparity"])
        assert np.allclose(
            native_example["cumulative_distribution_from_0_to_511"],
            python_example["cumulative_distribution_from_0_to_511"],
            atol=1e-3)
