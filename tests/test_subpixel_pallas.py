"""Pallas fused estimator: parity with the XLA path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from practicaldeepstereo_nips2018_tpu.ops import subpixel, subpixel_pallas


def test_pallas_estimator_matches_xla_interpret():
    similarities = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 40, 96))
    expected = subpixel.subpixel_map(similarities, 4, 2)
    got = subpixel_pallas.subpixel_map_pallas(similarities, 4, 2,
                                              interpret=True)
    assert got.shape == expected.shape
    assert np.allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_pallas_estimator_golden_interpret():
    similarities = jnp.asarray([0.1, 0.4, 0.3, 0.2, 0.3]).reshape(1, 1, 1, 5)
    got = subpixel_pallas.subpixel_map_pallas(
        similarities, half_support_window=2, disparity_step=1,
        interpret=True)
    assert np.isclose(float(got[0, 0, 0]), 1.52, atol=1e-4)


def test_pallas_estimator_nonmultiple_tile():
    # 997 pixels: exercises the tile padding path.
    similarities = jax.random.normal(jax.random.PRNGKey(1), (997, 48))
    expected = subpixel.subpixel_map(similarities, 4, 2)
    got = subpixel_pallas.subpixel_map_pallas(similarities, 4, 2,
                                              interpret=True)
    assert np.allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_pallas_estimator_cpu_fallback():
    # Without interpret on a CPU platform the call must fall back to XLA.
    similarities = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 16))
    expected = subpixel.subpixel_map(similarities, 4, 2)
    got = subpixel_pallas.subpixel_map_pallas(similarities, 4, 2)
    assert np.allclose(np.asarray(got), np.asarray(expected), atol=1e-6)
