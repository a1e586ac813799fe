#!/usr/bin/env python
"""Precomputes the FlyingThings3D disparity-statistics cache offline.

The reference computes per-example disparity statistics lazily on the first
dataset scan, which its README warns is slow (``README.md:21``). At pod
scale that stall multiplies per host; run this once (optionally pointing
``--cache_folder`` somewhere writable when the dataset mount is read-only)
and every subsequent ``find_examples`` is pure cache reads.

Example:
    python scripts/precompute_disparity_statistics.py \
        --dataset_folder datasets/flyingthings3d
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from practicaldeepstereo_nips2018_tpu.data import (  # noqa: E402
    precompute_disparity_statistics)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset_folder", required=True)
    parser.add_argument("--cache_folder", default=None)
    args = parser.parse_args()
    start = time.time()
    count = precompute_disparity_statistics(args.dataset_folder,
                                            args.cache_folder)
    print(f"scanned {count} examples in {time.time() - start:.1f}s")


if __name__ == "__main__":
    main()
