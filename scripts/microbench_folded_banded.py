#!/usr/bin/env python
"""Microbenchmark: dense depth-folded convs vs depth-banded formulations.

VERDICT r2 #4 asks for a real measurement of whether the structural zeros of
the dense folded hourglass convs (``ops/folded3d.py:29-50`` argues the win is
bounded at ~1.5-3x) can be reclaimed with a banded kernel. This script times
the DOMINANT folded conv shapes of the benchmark forward (576x960, D=191 ->
D'=48) in three forms:

(a) dense     — the shipped ``folded3d.conv3d_folded`` (one conv, dense
                [Din*cin, Dout*cout] channel matrix);
(b) xla-slab  — per 128-lane output group, convolve only the input SLAB the
                band actually touches (group depths + kd-1 halo), as plain
                XLA convs on lane slices, then concatenate; K shrinks from 3
                lane-tiles to 2 (the halo forces the partial second tile);
(c) pallas    — fused slab kernel: one pallas_call per conv, grid over
                (H tiles, output groups), manual HBM->VMEM DMA of the
                halo'd input block, 9 accumulated MXU dots of K=256 per
                group, bias fused.

Per shape it prints ms for each form and the winner; run on the real chip.
"""

import functools
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pds_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from practicaldeepstereo_nips2018_tpu.models import blocks  # noqa: E402
from practicaldeepstereo_nips2018_tpu.ops import folded3d  # noqa: E402
from practicaldeepstereo_nips2018_tpu.ops import folded_banded  # noqa: E402

# Sub-ms programs: long device loops + extra repeats, or relay jitter
# swamps the slope (a 0.2 ms program over 60 iterations is ~12 ms of device
# time against ~±10 ms of transport noise — measured negative slopes).
# The trip count is a runtime argument, so longer loops cost no recompiles.
SHORT, LONG, REPEATS = 20, 220, 5
DTYPE = jnp.bfloat16

# The folded conv shapes that dominate the benchmark forward (576x960 padded,
# D'=48): (name, H, W, depth_in, cin, cout, stride). The two quarter-res
# smooth convs (hourglass smoothing + expansion4 smooth) execute 45.9 GMac
# each; contraction1's two convs 11.5 GMac each (utils/flops.py).
SHAPES = [
    ("smooth_L1 (x2 in fwd)", 144, 240, 48, 8, 8, 1),
    ("contraction1_down", 144, 240, 48, 8, 16, 2),
    ("contraction1_smooth", 72, 120, 24, 16, 16, 1),
    ("expansion4_smooth=smooth_L1", None, None, None, None, None, None),
]


def slope(fn, params, x):
    """Device-loop slope timing (see bench.py: per-dispatch relay overhead
    is ~25 ms and does not pipeline — sub-ms programs MUST loop on device).
    """

    @jax.jit
    def run(params, x, iterations):
        def body(_, carry):
            out = fn(params, x + carry * 1e-30)
            return jnp.mean(out).astype(x.dtype)

        return jax.lax.fori_loop(0, iterations, body,
                                 jnp.zeros((), x.dtype))

    float(run(params, x, 1).astype(jnp.float32))  # compile

    def timed(iterations):
        start = time.perf_counter()
        float(run(params, x, iterations).astype(jnp.float32))
        return time.perf_counter() - start

    samples = []
    for _ in range(REPEATS):
        samples.append((timed(LONG) - timed(SHORT)) / (LONG - SHORT))
    return statistics.median(samples)


# Transposed folded convs (kernel 4, stride 2): (name, INPUT H, W, depth,
# cin, cout) — input resolutions of the benchmark forward (576x960, D'=48).
TRANSPOSED_SHAPES = [
    ("upsample_to_halfsize", 144, 240, 48, 8, 4),
    ("expansion4_up", 72, 120, 24, 16, 8),
]


def _compare(results, label, fn, params, folded, out_dense):
    try:
        out = jax.jit(fn)(params, folded)
        error = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - out_dense.astype(jnp.float32))))
        if error > 0.1:
            results[label] = f"WRONG (max err {error:.3f})"
        else:
            results[label] = slope(fn, params, folded)
    except Exception as exc:  # noqa: BLE001
        results[label] = f"FAILED ({type(exc).__name__}: {exc})"


def bench_transposed():
    for name, height, width, depth, cin, cout in TRANSPOSED_SHAPES:
        params = blocks.init_conv(jax.random.PRNGKey(0), 4, cin, cout,
                                  spatial_dims=3)
        params = jax.tree.map(lambda p: p.astype(DTYPE), params)
        folded = jax.random.uniform(
            jax.random.PRNGKey(1), (1, height, width, depth * cin), DTYPE)
        dense = slope(
            lambda p, x: folded3d.conv_transpose3d_folded(p, x, depth)[0],
            params, folded)
        out_dense = jax.jit(
            lambda p, x: folded3d.conv_transpose3d_folded(p, x, depth)[0])(
                params, folded)
        results = {"dense": dense}
        _compare(results, "xla-slab",
                 functools.partial(folded_banded.conv_transpose3d_folded_slab,
                                   depth_in=depth),
                 params, folded, out_dense)
        _compare(results, "phased",
                 functools.partial(
                     folded_banded.conv_transpose3d_folded_phased,
                     depth_in=depth),
                 params, folded, out_dense)
        print(f"{name}: " + ", ".join(
            f"{k}={v * 1e3:.3f} ms" if isinstance(v, float) else f"{k}={v}"
            for k, v in results.items()), flush=True)

    # Anisotropic fullsize upsampler: [1, 288, 480, 96*4] -> [1, 576, 960,
    # 96]; the one stage never timed in isolation before.
    params = blocks.init_conv(jax.random.PRNGKey(0), (3, 4, 4), 4, 1,
                              spatial_dims=3)
    params = jax.tree.map(lambda p: p.astype(DTYPE), params)
    folded = jax.random.uniform(jax.random.PRNGKey(1), (1, 288, 480, 384),
                                DTYPE)
    dense = slope(
        lambda p, x: folded3d.anisotropic_fullsize_transpose(p, x, 96),
        params, folded)
    out_dense = jax.jit(
        lambda p, x: folded3d.anisotropic_fullsize_transpose(p, x, 96))(
            params, folded)
    results = {"dense": dense}
    _compare(results, "phased",
             lambda p, x: folded_banded.anisotropic_fullsize_transpose_phased(
                 p, x, 96),
             params, folded, out_dense)
    print("anisotropic_fullsize: " + ", ".join(
        f"{k}={v * 1e3:.3f} ms" if isinstance(v, float) else f"{k}={v}"
        for k, v in results.items()), flush=True)


def main():
    for name, height, width, depth, cin, cout, stride in SHAPES:
        if height is None:
            continue
        key = jax.random.PRNGKey(0)
        params = blocks.init_conv(key, 3, cin, cout, spatial_dims=3)
        params = jax.tree.map(lambda p: p.astype(DTYPE), params)
        folded = jax.random.uniform(
            jax.random.PRNGKey(1), (1, height, width, depth * cin),
            DTYPE)

        dense = slope(
            lambda p, x: folded3d.conv3d_folded(p, x, depth, stride)[0],
            params, folded)
        out_dense = jax.jit(
            lambda p, x: folded3d.conv3d_folded(p, x, depth, stride)[0])(
                params, folded)

        results = {"dense": dense}
        for label, fn in (
                ("xla-slab", folded_banded.conv3d_folded_slab),
                ("pallas", folded_banded.conv3d_folded_pallas)):
            try:
                candidate = jax.jit(
                    functools.partial(fn, depth_in=depth, stride=stride))
                out = candidate(params, folded)
                error = float(jnp.max(jnp.abs(
                    out.astype(jnp.float32)
                    - out_dense.astype(jnp.float32))))
                if error > 0.1:
                    results[label] = f"WRONG (max err {error:.3f})"
                    continue
                results[label] = slope(
                    lambda p, x: fn(p, x, depth_in=depth, stride=stride),
                    params, folded)
            except Exception as exc:  # noqa: BLE001 — report, keep going
                results[label] = f"FAILED ({type(exc).__name__}: {exc})"

        print(f"{name}: " + ", ".join(
            f"{k}={v * 1e3:.3f} ms" if isinstance(v, float) else f"{k}={v}"
            for k, v in results.items()), flush=True)
    bench_transposed()


if __name__ == "__main__":
    main()
