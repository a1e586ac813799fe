#!/usr/bin/env python
"""Converts the reference's PyTorch checkpoint to this framework's format.

The reference distributes pretrained weights via a Google Drive link
(``/root/reference/README.md:33``). This tool maps that ``.bin`` checkpoint
(torch ``state_dict`` container saved by the reference's
``trainer.py:110-122``) onto this framework's parameter pytree and writes a
network-only ``.npz`` checkpoint loadable with
``PDSTrainer.load_checkpoint(..., load_only_network=True)``.

Example:
    python scripts/import_torch_checkpoint.py \
        --torch_checkpoint 010_checkpoint.bin \
        --output experiments/imported/000_checkpoint.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from practicaldeepstereo_nips2018_tpu.training import (  # noqa: E402
    checkpoint, torch_import)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--torch_checkpoint", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    params = torch_import.load_torch_checkpoint(args.torch_checkpoint)
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    checkpoint.save_checkpoint(args.output, {"params": params},
                               {"training_losses": [], "test_errors": [],
                                "source": os.path.abspath(
                                    args.torch_checkpoint)})
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
