#!/usr/bin/env python
"""Microbenchmark: lhs_dilation transposed conv vs phase-decomposed form.

The folded hourglass upsamplers are spatial 4x4 stride-2 pad-1 transposed
convs executed as ``conv_general_dilated`` with ``lhs_dilation=(2, 2)``. If
XLA:TPU does not skip the dilation zeros, that pays 16 taps per output where
only 4 are nonzero. The phase decomposition computes the four output parity
classes as four 2x2 stride-1 convs on the undilated input and interleaves
them — identical terms, 4x fewer MACs.

Not part of the public API; informs ``ops/folded3d.py``.
"""

import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pds_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEIGHT, WIDTH, LANES_IN, LANES_OUT = 144, 240, 384, 384
SHORT, LONG, REPEATS = 4, 20, 3
DTYPE = jnp.bfloat16


def transpose_dilated(x, kernel):
    return lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=[(2, 2), (2, 2)],
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def transpose_phased(x, kernel):
    batch, height, width, _ = x.shape
    out_ch = kernel.shape[-1]
    phases = []
    for row_parity in (0, 1):
        for col_parity in (0, 1):
            taps = kernel[row_parity::2, col_parity::2]  # [2, 2, I, O]
            pad_row = (1, 0) if row_parity == 0 else (0, 1)
            pad_col = (1, 0) if col_parity == 0 else (0, 1)
            phases.append(lax.conv_general_dilated(
                x, taps, window_strides=(1, 1),
                padding=[pad_row, pad_col],
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
    stacked = jnp.stack(phases, axis=3).reshape(
        batch, height, width, 2, 2, out_ch)
    return stacked.transpose(0, 1, 3, 2, 4, 5).reshape(
        batch, 2 * height, 2 * width, out_ch)


def slope(fn, x, kernel):
    @jax.jit
    def run(x, kernel, iterations):
        def body(_, carry):
            out = fn(x + carry * 1e-30, kernel)
            return jnp.mean(out).astype(x.dtype)

        return lax.fori_loop(0, iterations, body, jnp.zeros((), x.dtype))

    float(run(x, kernel, 1))

    def timed(iters):
        start = time.perf_counter()
        float(run(x, kernel, iters))
        return time.perf_counter() - start

    samples = [(timed(LONG) - timed(SHORT)) / (LONG - SHORT)
               for _ in range(REPEATS)]
    return statistics.median(samples)


def main():
    key_x, key_k = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(key_x, (1, HEIGHT, WIDTH, LANES_IN), DTYPE)
    kernel = jax.random.normal(key_k, (4, 4, LANES_IN, LANES_OUT), DTYPE)

    reference = transpose_dilated(x.astype(jnp.float32),
                                  kernel.astype(jnp.float32))
    phased = transpose_phased(x.astype(jnp.float32),
                              kernel.astype(jnp.float32))
    max_diff = float(jnp.max(jnp.abs(reference - phased)))
    print(f"max |dilated - phased| (f32): {max_diff:.2e}")
    if max_diff > 1e-4:
        raise SystemExit(
            f"phase decomposition does not match the dilated conv "
            f"(max diff {max_diff:.2e}) — the timing comparison below "
            f"would be between different computations")

    t_dilated = slope(transpose_dilated, x, kernel)
    t_phased = slope(transpose_phased, x, kernel)
    print(f"dilated: {t_dilated*1e3:7.3f} ms   phased: {t_phased*1e3:7.3f} ms"
          f"   speedup: {t_dilated/t_phased:.2f}x")


if __name__ == "__main__":
    main()
