#!/usr/bin/env python
"""Full-resolution training smoke test on real TPU hardware.

Overfits ONE synthetic 960x540 stereo pair (right = left shifted by a known
disparity) for ~50 steps with the reference's training configuration —
D=255, batch 1, bf16 compute, rematerialized hourglass — and asserts the
loss drops. This proves the full-resolution training MEMORY path (the
cost-volume activations that dominate HBM, SURVEY §7 hard part #1) works on
hardware, not just on 64x64 CPU fixtures.

Writes the loss curve to OVERFIT_TPU_r02.json (one JSON line on stdout).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pds_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from practicaldeepstereo_nips2018_tpu import models, ops  # noqa: E402
from practicaldeepstereo_nips2018_tpu.training import optimizer  # noqa: E402

HEIGHT, WIDTH = 540, 960
MAXIMUM_DISPARITY = 255
TRUE_DISPARITY = 20.0
STEPS = 50
CHUNK = 10  # steps per device dispatch
LEARNING_RATE = 1e-3


def main():
    config = models.PDSConfig(maximum_disparity=MAXIMUM_DISPARITY,
                              remat=True)
    params = models.init(jax.random.PRNGKey(0), config)
    transform = optimizer.rmsprop()
    opt_state = transform.init(params)

    # A textured pair with a known uniform shift: right(x) = left(x - d)
    # means the LEFT image at x matches RIGHT at x - d, i.e. disparity d.
    rng = np.random.RandomState(0)
    texture = rng.uniform(0, 255, (1, HEIGHT, WIDTH + 64, 3)).astype(
        np.float32)
    shift = int(TRUE_DISPARITY)
    left = jnp.asarray(texture[:, :, shift:shift + WIDTH])
    right = jnp.asarray(texture[:, :, :WIDTH])
    ground_truth = jnp.full((1, HEIGHT, WIDTH), TRUE_DISPARITY,
                            jnp.float32)

    @jax.jit
    def run_chunk(params, opt_state, learning_rate, iterations):
        def step(_, carry):
            params, opt_state, _ = carry

            def loss_fn(p):
                similarities = models.apply(p, left, right, config,
                                            compute_dtype=jnp.bfloat16)
                return ops.subpixel_cross_entropy(
                    similarities, ground_truth,
                    disparity_step=config.disparity_step)

            loss, gradients = jax.value_and_grad(loss_fn)(params)
            updates, new_opt_state = transform.update(gradients, opt_state)
            new_params = jax.tree.map(
                lambda p, u: p - learning_rate * u, params, updates)
            return new_params, new_opt_state, loss

        return jax.lax.fori_loop(0, iterations, step,
                                 (params, opt_state, jnp.float32(0.0)))

    # Warm up / compile with a zero-iteration chunk (the trip count is a
    # runtime argument, so this compiles the one program without stepping).
    jax.block_until_ready(
        run_chunk(params, opt_state, LEARNING_RATE, 0))

    losses = []
    start = time.time()
    for _ in range(STEPS // CHUNK):
        params, opt_state, loss = run_chunk(params, opt_state,
                                            LEARNING_RATE, CHUNK)
        losses.append(float(loss))
    elapsed = time.time() - start

    result = {
        "metric": "overfit_tpu_smoke",
        "shape": [HEIGHT, WIDTH],
        "maximum_disparity": MAXIMUM_DISPARITY,
        "compute_dtype": "bfloat16",
        "remat": True,
        "device": str(jax.devices()[0]),
        "steps": STEPS,
        "losses_every_10_steps": [round(l, 4) for l in losses],
        "seconds_total": round(elapsed, 2),
        "loss_dropped": losses[-1] < losses[0],
    }
    print(json.dumps(result))
    if not result["loss_dropped"]:
        raise SystemExit("loss did not drop: " + str(losses))
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo_root, "OVERFIT_TPU_r02.json"),
              "w") as handle:
        json.dump(result, handle, indent=1)


if __name__ == "__main__":
    main()
