#!/usr/bin/env python
"""Full-resolution training smoke test on real TPU hardware.

Overfits ONE synthetic 960x540 stereo pair for ~120 steps with the
reference's training configuration — D=255, batch 1, bf16 compute,
rematerialized hourglass — and asserts the training is CONCLUSIVE, not just
that some loss fell:

* The pair carries a spatially-VARYING disparity (top half shifted by 20 px,
  bottom half by 40 px, from two independent textures). A network that only
  learns the target marginal (an input-independent disparity distribution)
  can at best reach the entropy of the 20/40 MIXTURE — about ln(2) nats
  above the per-pixel target entropy. Only true left/right matching can
  separate the halves and approach the per-pixel floor.
* The per-pixel floor is computed exactly: the subpixel cross-entropy is
  H(target) + KL(target || prediction), so its minimum is the entropy of the
  normalized Laplace target on the even-disparity grid. The final loss must
  come within 0.15 nats of that floor.
* The eval path (SubpixelMap estimator) must recover the ground-truth
  disparity to < 1 px MAE on pixels with a valid match.

Geometry convention (reference ``matching.py:56-62``): ``left[x]`` matches
``right[x - d]`` for disparity d — i.e. ``right[x] = texture[x + d]`` when
``left = texture``. Columns x < d have no match and are masked to inf
(unknown) in the ground truth, exactly like sparse KITTI ground truth.

This proves the full-resolution training MEMORY path (the cost-volume
activations that dominate HBM, SURVEY §7 hard part #1) works on hardware,
and that the end-to-end gradient actually performs stereo matching.

Writes the result to OVERFIT_TPU_r03.json (one JSON line on stdout).
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
DISPARITIES = (20.0, 40.0)  # top half / bottom half
STEPS = 120
CHUNK = 10  # steps per device dispatch
LEARNING_RATE = 1e-3
DIVERSITY = 1.0


def make_pair():
    """Stereo pair with disparity 20 in the top half, 40 in the bottom."""
    left = np.empty((1, HEIGHT, WIDTH, 3), np.float32)
    right = np.empty((1, HEIGHT, WIDTH, 3), np.float32)
    ground_truth = np.empty((1, HEIGHT, WIDTH), np.float32)
    half = HEIGHT // 2
    rows = [slice(0, half), slice(half, HEIGHT)]
    for (row_slice, disparity), seed in zip(zip(rows, DISPARITIES), (0, 1)):
        rng = np.random.RandomState(seed)
        texture = rng.uniform(
            0, 255,
            (row_slice.stop - row_slice.start, WIDTH + 64, 3)).astype(
                np.float32)
        shift = int(disparity)
        # left[x] = texture[x]; right[x] = texture[x + d]  =>
        # right[x - d] = texture[x] = left[x]: disparity +d.
        left[0, row_slice] = texture[:, :WIDTH]
        right[0, row_slice] = texture[:, shift:shift + WIDTH]
        ground_truth[0, row_slice] = disparity
        ground_truth[0, row_slice, :shift] = np.inf  # no match in view
    return jnp.asarray(left), jnp.asarray(right), ground_truth


def loss_floor(ground_truth: np.ndarray) -> float:
    """Exact minimum of the subpixel cross-entropy for this ground truth:
    the mean (over valid pixels) entropy of the normalized Laplace target on
    the even-disparity grid (loss = H(target) + KL(target || softmax))."""
    grid = np.arange(0, MAXIMUM_DISPARITY + 1, 2, dtype=np.float64)
    valid = np.isfinite(ground_truth)
    entropies = []
    counts = []
    for disparity in np.unique(ground_truth[valid]):
        weights = np.exp(-np.abs(disparity - grid) / DIVERSITY)
        probabilities = weights / weights.sum()
        support = probabilities > 0
        entropy = -np.sum(probabilities[support]
                          * np.log(probabilities[support]))
        entropies.append(entropy)
        counts.append(np.sum(ground_truth[valid] == disparity))
    return float(np.average(entropies, weights=counts))


def main():
    config = models.PDSConfig(maximum_disparity=MAXIMUM_DISPARITY,
                              remat=True)
    params = models.init(jax.random.PRNGKey(0), config)
    transform = optimizer.rmsprop()
    opt_state = transform.init(params)

    left, right, ground_truth_host = make_pair()
    ground_truth = jnp.asarray(ground_truth_host)
    floor = loss_floor(ground_truth_host)

    @jax.jit
    def run_chunk(params, opt_state, learning_rate, iterations):
        def step(_, carry):
            params, opt_state, _ = carry

            def loss_fn(p):
                similarities = models.apply(p, left, right, config,
                                            compute_dtype=jnp.bfloat16)
                return ops.subpixel_cross_entropy(
                    similarities, ground_truth, diversity=DIVERSITY,
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

    # Eval path: the estimator must recover the two-level disparity map.
    estimated = np.asarray(jax.jit(
        lambda p: models.infer(p, left, right, config,
                               compute_dtype=jnp.bfloat16))(params))
    valid = np.isfinite(ground_truth_host)
    mean_absolute_error = float(
        np.abs(estimated - ground_truth_host)[valid].mean())

    result = {
        "metric": "overfit_tpu_smoke",
        "shape": [HEIGHT, WIDTH],
        "maximum_disparity": MAXIMUM_DISPARITY,
        "true_disparities": list(DISPARITIES),
        "compute_dtype": "bfloat16",
        "remat": True,
        "device": str(jax.devices()[0]),
        "steps": STEPS,
        "losses_every_10_steps": [round(l, 4) for l in losses],
        "loss_floor": round(floor, 4),
        "final_loss_minus_floor": round(losses[-1] - floor, 4),
        "estimator_mae_px": round(mean_absolute_error, 4),
        "seconds_total": round(elapsed, 2),
        "converged_to_floor": losses[-1] - floor < 0.15,
        "matching_learned": mean_absolute_error < 1.0,
    }
    print(json.dumps(result))
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo_root, "OVERFIT_TPU_r03.json"),
              "w") as handle:
        json.dump(result, handle, indent=1)
    if not (result["converged_to_floor"] and result["matching_learned"]):
        raise SystemExit("smoke failed: " + json.dumps(result))


if __name__ == "__main__":
    main()
