"""Serving-session tests: the deployment wrapper over models.infer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from practicaldeepstereo_nips2018_tpu import models
from practicaldeepstereo_nips2018_tpu.serving import InferenceSession
from practicaldeepstereo_nips2018_tpu.training import checkpoint


@pytest.fixture(scope="module")
def setup():
    config = models.PDSConfig(maximum_disparity=63)
    params = models.init(jax.random.PRNGKey(0), config)
    rng = np.random.RandomState(0)
    left = rng.uniform(0, 255, (1, 32, 48, 3)).astype(np.float32)
    right = rng.uniform(0, 255, (1, 32, 48, 3)).astype(np.float32)
    return config, params, left, right


def test_predict_matches_models_infer(setup):
    config, params, left, right = setup
    session = InferenceSession(params, config, compute_dtype=None)
    predicted = session.predict(left, right)
    # Compare against the SAME jitted program (an eager op-by-op
    # models.infer is a different compilation variant: on a random-init
    # network reduction-order noise flips isolated argmaxes by a whole
    # disparity step — the known compilation-variant behavior pinned in
    # test_parallel.py::test_sharded_infer_matches_unsharded).
    expected = np.asarray(jax.jit(
        lambda p, l, r: models.infer(p, l, r, config))(
            params, jnp.asarray(left), jnp.asarray(right)))
    assert predicted.shape == (1, 32, 48)
    assert predicted.dtype == np.float32
    np.testing.assert_allclose(predicted, expected, atol=1e-5)


def test_warmup_and_odd_shapes(setup):
    config, params, left, right = setup
    session = InferenceSession(params, config)
    session.warmup(height=32, width=48)
    assert session.predict(left, right).shape == (1, 32, 48)
    # Non-multiple-of-64 inputs pad internally (the 64-rule), batch > 1.
    odd = np.random.RandomState(1).uniform(
        0, 255, (2, 30, 49, 3)).astype(np.float32)
    assert session.predict(odd, odd).shape == (2, 30, 49)


def test_from_checkpoint_roundtrip(setup, tmp_path):
    config, params, left, right = setup
    path = str(tmp_path / "010_checkpoint.npz")
    checkpoint.save_checkpoint(
        path, {"params": params, "opt_state": {"ignored": jnp.zeros(3)}},
        {"training_losses": [1.0]})
    session = InferenceSession.from_checkpoint(path, config,
                                               compute_dtype=None)
    direct = InferenceSession(params, config, compute_dtype=None)
    np.testing.assert_array_equal(session.predict(left, right),
                                  direct.predict(left, right))


def test_batched_modes_agree(setup):
    """batch > 1 defaults to the fully-unrolled formulation (r5: the
    direct batched program materializes layout copies XLA fuses away at
    batch 1, EVAL_BATCH_COST_r05.json; unroll keeps batch-1 fusion per
    image and overlaps images, EVAL_BATCH_MAP_r05.json); all three modes
    must stay program-variant bulk-identical."""
    config, params, _, _ = setup
    rng = np.random.RandomState(2)
    left = rng.uniform(0, 255, (3, 32, 48, 3)).astype(np.float32)
    right = rng.uniform(0, 255, (3, 32, 48, 3)).astype(np.float32)
    default = InferenceSession(params, config, compute_dtype=None)
    assert default._batched_mode == "unroll"  # the shipped default
    direct = InferenceSession(params, config, compute_dtype=None,
                              batched_mode="direct")
    mapped = InferenceSession(params, config, compute_dtype=None,
                              batched_mode="map")
    out_default = default.predict(left, right)
    out_direct = direct.predict(left, right)
    out_mapped = mapped.predict(left, right)
    assert out_default.shape == out_direct.shape == (3, 32, 48)
    # Different compiled programs: on a random-init network isolated
    # pixels flip argmax between compilation variants (same bulk-agreement
    # contract as test_parallel.py::test_sharded_infer_matches_unsharded).
    for other in (out_direct, out_mapped):
        difference = np.abs(out_default - other)
        assert (difference < 1e-2).mean() > 0.999, (difference > 1e-2).mean()
    # Batch 1 must bypass the loop (identical program to direct).
    np.testing.assert_array_equal(default.predict(left[:1], right[:1]),
                                  direct.predict(left[:1], right[:1]))


def test_batched_mode_validated(setup):
    config, params, _, _ = setup
    import pytest as _pytest
    with _pytest.raises(ValueError, match="batched_mode"):
        InferenceSession(params, config, batched_mode="nope")
