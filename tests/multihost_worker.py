"""Worker process for the 2-process distributed runtime test.

Launched by ``tests/test_multihost.py`` (one instance per process). Joins
the JAX distributed runtime on CPU, then exercises the three multi-host
contracts the single-process suite cannot: the host-sharded ``Loader``, the
cross-host eval-metric reduction of ``PDSTrainer._test``, and single-writer
log/checkpoint output. Results are dumped as JSON for the parent to assert.

Usage: python multihost_worker.py <process_id> <port> <output_json> <folder>
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402

from practicaldeepstereo_nips2018_tpu import models  # noqa: E402
from practicaldeepstereo_nips2018_tpu.data import Loader  # noqa: E402
from practicaldeepstereo_nips2018_tpu.parallel import runtime  # noqa: E402
from practicaldeepstereo_nips2018_tpu.training import (  # noqa: E402
    PDSTrainer, checkpoint)

NUMBER_OF_EXAMPLES = 3
HEIGHT, WIDTH = 64, 96


class SyntheticStereoDataset:
    """Deterministic in-memory dataset (identical on every host)."""

    def __len__(self):
        return NUMBER_OF_EXAMPLES

    def __getitem__(self, index: int) -> dict:
        rng = np.random.RandomState(100 + index)
        return {
            "left": {
                "image": rng.uniform(
                    0, 255, (HEIGHT, WIDTH, 3)).astype(np.float32),
                "disparity_image": rng.uniform(
                    0, 40, (HEIGHT, WIDTH)).astype(np.float32),
            },
            "right": {
                "image": rng.uniform(
                    0, 255, (HEIGHT, WIDTH, 3)).astype(np.float32),
            },
        }

    def example_files(self, index: int) -> dict:
        return {"left": {"image": f"example_{index:03d}.png"}}


def main():
    process_id = int(sys.argv[1])
    port = sys.argv[2]
    output_filename = sys.argv[3]
    experiment_folder = sys.argv[4]

    topology = runtime.initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2,
        process_id=process_id)

    dataset = SyntheticStereoDataset()
    loader = Loader(dataset, batch_size=1, num_workers=1,
                    host_index=topology["process_index"],
                    host_count=topology["process_count"])
    shard_names = [batch["names"][0] for batch in loader]

    config = models.PDSConfig(maximum_disparity=63)
    trainer = PDSTrainer(
        network_config=config,
        params=models.init(jax.random.PRNGKey(0), config),
        test_set_loader=loader,
        experiment_folder=experiment_folder)
    errors, processing_time = trainer.test()
    trainer._save_checkpoint()

    with open(output_filename, "w") as handle:
        json.dump({
            "topology": topology,
            "shard_names": shard_names,
            "errors": errors,
            "processing_time": processing_time,
            "checkpoint_filename": checkpoint.checkpoint_filename(
                experiment_folder, 1),
        }, handle)


if __name__ == "__main__":
    main()
