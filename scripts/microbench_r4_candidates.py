#!/usr/bin/env python
"""Round-4 perf-candidate microbenchmarks (measure BEFORE building).

Three candidates from VERDICT r3 / the round-3 handoff, each isolated at
its real composed shape so the numbers bound the composed prize:

1. ``--int8``: the matching tail's paired 3x3 conv (128->128 at 144x240x24)
   in bf16 vs int8xint8->int32 (v5e int8 peak is 2x bf16). Includes the
   quantize pass cost (static scale) — the tail sits at its bf16 roofline
   (77% executed-MFU), so int8 is the only >1.5x lever left on it.
2. ``--norms``: the paired tail with vs without its 4 instance norms — the
   delta UPPER-BOUNDS what a perfect conv+stats epilogue fusion could save
   (VERDICT r3 top perf ask). If the delta is small, the fusion is a
   documented negative result without building the Pallas kernel.
3. ``--s2d``: embedding first conv, 5x5-stride-2 cin=3 (reads a 42x
   lane-padded image) vs the EXACT space-to-depth form: 3x3 stride-1
   cin=12 at half resolution (kernel embedding proven in
   ``ops/spacetodepth.py`` once adopted).

Timing: jitted fori_loop slope with carried perturbation (host-dispatch
overhead and relay latency cancel in the slope; see memory discipline).
"""

import argparse
import functools
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

from practicaldeepstereo_nips2018_tpu.models import blocks, matching  # noqa: E402

HEIGHT, WIDTH = 144, 240  # descriptor resolution for 576x960 padded input
PAIRS = 24                # D'=48 disparities, paired
SHORT, LONG, REPEATS = 5, 45, 5
DTYPE = jnp.bfloat16


def slope(fn, *args):
    @jax.jit
    def run(first, iterations):
        def body(_, carry):
            out = fn(first + carry * jnp.asarray(1e-30, first.dtype),
                     *args[1:])
            leaves = jax.tree.leaves(out)
            return sum(jnp.mean(leaf).astype(jnp.float32)
                       for leaf in leaves).astype(first.dtype)

        return lax.fori_loop(0, iterations, body,
                             jnp.zeros((), first.dtype))

    float(run(args[0], 1))

    def timed(iters):
        start = time.perf_counter()
        float(run(args[0], iters))
        return time.perf_counter() - start

    samples = [(timed(LONG) - timed(SHORT)) / (LONG - SHORT)
               for _ in range(REPEATS)]
    return statistics.median(samples)


def bench_int8():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (PAIRS, HEIGHT, WIDTH, 128), DTYPE)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 128, 128),
                          DTYPE) * 0.05

    def conv_bf16(x):
        return lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    t_bf16 = slope(conv_bf16, x)
    print(f"bf16 3x3 128->128 paired-tail conv:   {t_bf16*1e3:8.3f} ms")

    w_scale = jnp.max(jnp.abs(w)) / 127.0
    w_q = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)
    x_scale = jnp.asarray(6.0 / 127.0, jnp.float32)  # static clip at 6 sigma

    def quantize(x):
        return jnp.clip(jnp.round(x * (1.0 / x_scale).astype(DTYPE)),
                        -127, 127).astype(jnp.int8)

    # NOTE: an int8-INPUT variant cannot be slope-timed here — the carried
    # float perturbation truncates to exactly zero in int8, the loop body
    # becomes invariant and XLA hoists it (measured: negative slope). The
    # pure conv cost is bounded instead as (full - quantize-only).
    t_quantize = slope(quantize, x)
    print(f"quantize pass alone:                  {t_quantize*1e3:8.3f} ms")

    def conv_int8_quantize_dequant(x):
        out = lax.conv_general_dilated(
            quantize(x), w_q, window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (out.astype(jnp.float32)
                * (x_scale * w_scale)).astype(DTYPE)

    t_int8_full = slope(conv_int8_quantize_dequant, x)
    print(f"int8 conv + quantize + dequant:       {t_int8_full*1e3:8.3f} ms")
    print(f"int8 conv+dequant (minus quantize):   "
          f"{(t_int8_full-t_quantize)*1e3:8.3f} ms")
    print(f"speedup (with q+dq / conv-only est):  "
          f"{t_bf16/t_int8_full:4.2f}x / "
          f"{t_bf16/max(t_int8_full-t_quantize, 1e-9):4.2f}x")


def bench_norms():
    params = jax.tree.map(
        lambda p: p.astype(DTYPE),
        matching._pair_tail_params(matching.init(jax.random.PRNGKey(0))))
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (PAIRS, HEIGHT, WIDTH, 128), DTYPE)

    def tail_with_norms(x):
        for name in ("residual1", "residual2"):
            x = blocks.residual_block(params[name], x)
        return blocks.conv(params["tail"], x)

    def tail_without_norms(x):
        for name in ("residual1", "residual2"):
            y = x
            for block_name in ("block1", "block2"):
                y = blocks.leaky_relu(
                    blocks.conv(params[name][block_name]["conv"], y))
            x = x + y
        return blocks.conv(params["tail"], x)

    t_with = slope(tail_with_norms, x)
    t_without = slope(tail_without_norms, x)
    print(f"paired tail with 4 instance norms:    {t_with*1e3:8.3f} ms")
    print(f"paired tail without norms:            {t_without*1e3:8.3f} ms")
    print(f"=> perfect-fusion upper bound:        "
          f"{(t_with-t_without)*1e3:8.3f} ms")


def bench_hourglass_norms():
    """Hourglass core with vs without instance norms — the fusion upper
    bound on the regularization side (VERDICT r3 perf ask #1)."""
    from practicaldeepstereo_nips2018_tpu.models import regularization
    from practicaldeepstereo_nips2018_tpu.ops import folded3d

    depth = 48
    params = jax.tree.map(
        lambda p: p.astype(DTYPE),
        regularization.init(jax.random.PRNGKey(0)))
    folded = jax.random.normal(jax.random.PRNGKey(1),
                               (1, HEIGHT, WIDTH, depth * 8), DTYPE)
    shortcut = jax.random.normal(jax.random.PRNGKey(2),
                                 (1, HEIGHT, WIDTH, 8), DTYPE)

    def core(x):
        return regularization.hourglass_core(params, x, depth, shortcut,
                                             impl="banded_slab")[0]

    t_core = slope(core, folded)
    print(f"hourglass core (banded_slab):         {t_core*1e3:8.3f} ms")

    real_norm = folded3d.instance_norm_folded

    def no_norm(x, depth_, norm_params=None):
        # Affine-only stand-in: keeps tensor shapes/dtypes and the affine
        # multiply, drops the moment reduction + apply passes.
        if norm_params is None:
            return x
        channels = norm_params["scale"].shape[0]
        scale = jnp.tile(norm_params["scale"], depth_).astype(x.dtype)
        bias = jnp.tile(norm_params["bias"], depth_).astype(x.dtype)
        return x * scale + bias

    folded3d.instance_norm_folded = no_norm
    try:
        t_no_norm = slope(core, folded)
    finally:
        folded3d.instance_norm_folded = real_norm
    print(f"hourglass core without norms:         {t_no_norm*1e3:8.3f} ms")
    print(f"=> perfect-fusion upper bound:        "
          f"{(t_core-t_no_norm)*1e3:8.3f} ms")


def bench_s2d():
    height, width = 576, 960
    image = jax.random.normal(jax.random.PRNGKey(0),
                              (1, height, width, 3), DTYPE)
    w5 = jax.random.normal(jax.random.PRNGKey(1), (5, 5, 3, 64),
                           DTYPE) * 0.05

    def conv5_s2(img):
        return lax.conv_general_dilated(
            img, w5, window_strides=(2, 2), padding=[(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    t5 = slope(conv5_s2, image)
    print(f"5x5 s2 cin=3 conv (full res):         {t5*1e3:8.3f} ms")

    w3 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 12, 64),
                           DTYPE) * 0.05

    def s2d_then_conv3(img):
        b, h, w_, c = img.shape
        phases = img.reshape(b, h // 2, 2, w_ // 2, 2, c)
        phases = jnp.transpose(phases, (0, 1, 3, 2, 4, 5)).reshape(
            b, h // 2, w_ // 2, 4 * c)
        return lax.conv_general_dilated(
            phases, w3, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    t_s2d = slope(s2d_then_conv3, image)
    print(f"s2d(2x2) + 3x3 s1 cin=12 (half res):  {t_s2d*1e3:8.3f} ms")

    half = jax.random.normal(jax.random.PRNGKey(3),
                             (1, height // 2, width // 2, 12), DTYPE)

    def conv3_only(phases):
        return lax.conv_general_dilated(
            phases, w3, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    t3 = slope(conv3_only, half)
    print(f"3x3 s1 cin=12 conv alone:             {t3*1e3:8.3f} ms")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--int8", action="store_true")
    parser.add_argument("--norms", action="store_true")
    parser.add_argument("--hourglass_norms", action="store_true")
    parser.add_argument("--s2d", action="store_true")
    args = parser.parse_args()
    print("device:", jax.devices()[0].device_kind)
    if args.int8:
        bench_int8()
    if args.norms:
        bench_norms()
    if args.hourglass_norms:
        bench_hourglass_norms()
    if args.s2d:
        bench_s2d()


if __name__ == "__main__":
    main()
