#!/usr/bin/env python
"""Scaling-efficiency harness: frames/s of the jitted train step vs mesh size.

BASELINE target: >= 80% frames/s scaling efficiency at N >= 2 devices. This
script runs the SAME donated training step over (data x volume) meshes of
1..N devices with a per-data-row batch of one example (weak scaling — the
reference protocol trains batch 1 per device) and reports frames/s plus
efficiency relative to the 1-device run, as one JSON line and an artifact
file.

On this environment only one physical TPU chip is reachable, so the default
run uses N virtual CPU devices (``--platform cpu`` forces it); the harness
then validates correctness and artifact shape, and the recorded efficiency
is marked ``virtual: true`` (virtual devices share host cores — their
efficiency number is NOT the ICI number). On real multi-chip hardware the
same invocation produces the BASELINE metric directly.

Usage:
    python scripts/bench_scaling.py [--devices 8] [--platform cpu]
        [--height 64] [--width 128] [--maximum_disparity 63]
        [--output SCALING.json]
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--devices", type=int, default=8)
    parser.add_argument("--platform", default="cpu",
                        choices=["cpu", "tpu", "default"],
                        help="cpu = N virtual host devices (the only option "
                        "without multi-chip hardware)")
    parser.add_argument("--height", type=int, default=64)
    parser.add_argument("--width", type=int, default=128)
    parser.add_argument("--maximum_disparity", type=int, default=63)
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--output", default=None,
                        help="artifact JSON path (optional)")
    return parser.parse_args()


def main():
    arguments = parse_arguments()
    if arguments.platform == "cpu":
        flag = f"--xla_force_host_platform_device_count={arguments.devices}"
        if flag not in os.environ.get("XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "") + " " + flag).strip()

    import jax
    if arguments.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from practicaldeepstereo_nips2018_tpu import models, ops
    from practicaldeepstereo_nips2018_tpu.parallel import make_mesh, sharding
    from practicaldeepstereo_nips2018_tpu.training import optimizer

    config = models.PDSConfig(maximum_disparity=arguments.maximum_disparity)
    params = models.init(jax.random.PRNGKey(0), config)
    transform = optimizer.rmsprop()
    opt_state = transform.init(params)

    available = len(jax.devices())
    mesh_sizes = [n for n in (1, 2, 4, 8, 16, 32)
                  if n <= min(arguments.devices, available)]
    # Every (data, volume) decomposition is measured and recorded SEPARATELY
    # — data-scaling and volume-scaling have different communication costs
    # (gradient psum vs conv halo exchange), so one efficiency series that
    # silently switches decomposition with N would conflate them.
    decompositions = []
    for n_devices in mesh_sizes:
        decompositions.append((n_devices, 1))
        if n_devices % 2 == 0:
            decompositions.append((n_devices // 2, 2))

    def measure(data_size: int, volume: int) -> float:
        """Frames/s of the train step on a (data x volume) mesh."""
        n_devices = data_size * volume
        mesh = make_mesh(data=data_size, volume=volume,
                         devices=jax.devices()[:n_devices])
        batch = data_size
        keys = jax.random.split(jax.random.PRNGKey(1), 3)
        shape = (batch, arguments.height, arguments.width)
        left = jax.random.uniform(keys[0], shape + (3,)) * 255.0
        right = jax.random.uniform(keys[1], shape + (3,)) * 255.0
        ground_truth = jax.random.uniform(keys[2], shape) * 40.0

        replicated = NamedSharding(mesh, P())
        placed_params = jax.device_put(params, replicated)
        placed_opt_state = jax.device_put(opt_state, replicated)
        batch_spec = sharding.compatible_batch_sharding
        left = jax.device_put(left, batch_spec(mesh, left.shape))
        right = jax.device_put(right, batch_spec(mesh, right.shape))
        ground_truth = jax.device_put(
            ground_truth, batch_spec(mesh, ground_truth.shape))

        @jax.jit
        def run(params, opt_state, iterations):
            def step(_, carry):
                params, opt_state, _ = carry

                def loss_fn(p):
                    similarities = models.apply(p, left, right, config)
                    return ops.subpixel_cross_entropy(
                        similarities, ground_truth,
                        disparity_step=config.disparity_step)

                loss, gradients = jax.value_and_grad(loss_fn)(params)
                updates, new_opt_state = transform.update(gradients,
                                                          opt_state)
                new_params = jax.tree.map(lambda p, u: p - 1e-3 * u,
                                          params, updates)
                return new_params, new_opt_state, loss

            carry = jax.lax.fori_loop(
                0, iterations, step,
                (params, opt_state, jnp.float32(0.0)))
            return carry[-1]

        loss = float(run(placed_params, placed_opt_state, 1))  # compile
        if loss != loss:
            raise RuntimeError(f"NaN loss on {n_devices}-device mesh")

        def timed(iterations):
            start = time.perf_counter()
            float(run(placed_params, placed_opt_state, iterations))
            return time.perf_counter() - start

        short_steps = max(1, arguments.steps // 4)
        samples = [
            (timed(arguments.steps) - timed(short_steps))
            / (arguments.steps - short_steps)
            for _ in range(arguments.repeats)
        ]
        seconds_per_step = statistics.median(samples)
        return batch / seconds_per_step

    def measure_eval(data_size: int, volume: int) -> float:
        """Frames/s of the per-example-metric eval step with one example per
        data row (examples shard over ``data`` — the trainer's batched eval
        path, ``training/trainer.py::_eval_step``)."""
        n_devices = data_size * volume
        mesh = make_mesh(data=data_size, volume=volume,
                         devices=jax.devices()[:n_devices])
        batch = data_size
        keys = jax.random.split(jax.random.PRNGKey(2), 3)
        shape = (batch, arguments.height, arguments.width)
        left = jax.random.uniform(keys[0], shape + (3,)) * 255.0
        right = jax.random.uniform(keys[1], shape + (3,)) * 255.0
        ground_truth = jax.random.uniform(keys[2], shape) * 40.0

        replicated = NamedSharding(mesh, P())
        placed_params = jax.device_put(params, replicated)
        batch_spec = sharding.compatible_batch_sharding
        left = jax.device_put(left, batch_spec(mesh, left.shape))
        right = jax.device_put(right, batch_spec(mesh, right.shape))
        ground_truth = jax.device_put(
            ground_truth, batch_spec(mesh, ground_truth.shape))

        @jax.jit
        def run(params, iterations):
            def step(_, carry):
                disparity = models.infer(params, left + carry * 1e-30,
                                         right, config)
                _, three_pe = jax.vmap(ops.n_pixels_error)(disparity,
                                                           ground_truth)
                _, mae = jax.vmap(ops.absolute_error)(disparity,
                                                      ground_truth)
                return jnp.mean(three_pe) + jnp.mean(mae)

            return jax.lax.fori_loop(0, iterations, step, jnp.float32(0.0))

        float(run(placed_params, 1))  # compile

        def timed(iterations):
            start = time.perf_counter()
            float(run(placed_params, iterations))
            return time.perf_counter() - start

        short_steps = max(1, arguments.steps // 4)
        samples = [
            (timed(arguments.steps) - timed(short_steps))
            / (arguments.steps - short_steps)
            for _ in range(arguments.repeats)
        ]
        return batch / statistics.median(samples)

    entries = []
    for data_size, volume in decompositions:
        entries.append({
            "devices": data_size * volume,
            "data": data_size,
            "volume": volume,
            "train_frames_per_second": round(measure(data_size, volume), 3),
            "eval_frames_per_second": round(
                measure_eval(data_size, volume), 3),
        })

    base = next(e for e in entries if e["devices"] == 1)
    for entry in entries:
        entry["train_efficiency_vs_1_device"] = round(
            entry["train_frames_per_second"]
            / (entry["devices"] * base["train_frames_per_second"]), 3)
        entry["eval_efficiency_vs_1_device"] = round(
            entry["eval_frames_per_second"]
            / (entry["devices"] * base["eval_frames_per_second"]), 3)

    report = {
        "metric": "train_scaling_efficiency",
        "unit": "fraction_of_linear",
        "platform": jax.devices()[0].platform,
        "virtual": arguments.platform == "cpu",
        "note": ("virtual CPU devices share host cores; these numbers "
                 "validate the harness and the sharded programs, NOT ICI "
                 "scaling" if arguments.platform == "cpu" else
                 "real multi-chip run"),
        "shape": [arguments.height, arguments.width],
        "maximum_disparity": arguments.maximum_disparity,
        "entries": entries,
    }
    print(json.dumps(report))
    if arguments.output:
        with open(arguments.output, "w") as handle:
            json.dump(report, handle, indent=1)


if __name__ == "__main__":
    main()
