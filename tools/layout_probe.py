#!/usr/bin/env python
"""Layout shootout for the flagship's hot pattern: stacks of 3x3 conv +
GroupNorm + swish at C=32 on a [8, 256, 128] grid.

All timing is CHAINED (each iteration consumes the previous output) — on the
axon relay, repeated identical executions are result-cached and report
impossibly fast times (see PERFORMANCE.md round 2).

Variants:
  nhwc      [B, N, F, C]  flax-style channels-last (current model layout)
  nchw      [B, C, N, F]  channels-second, F minor (128 lanes, no padding)
  nhcw      [B, N, C, F]  channels third, F minor
  s2d       [B, N/2, F/2, 4C] space-to-depth channels-last (C=128, no pad)
"""

import os
import sys
import time
from functools import partial

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
import jax.numpy as jnp
import numpy as np

B, N, F, C = 8, 256, 128, 32
LAYERS = 12
GROUPS = 32  # per-channel groups at C=32


def chained_time(fn, x, iters=10):
    x = fn(x)
    x.block_until_ready()
    start = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    x.block_until_ready()
    return (time.perf_counter() - start) / iters


def gn_swish(x, axis_c, spatial_axes):
    """Per-channel (groups==C) norm over spatial dims + swish, f32 stats."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=spatial_axes, keepdims=True)
    var = jnp.var(x32, axis=spatial_axes, keepdims=True)
    h = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
    return jax.nn.silu(h)


def run_nhwc():
    k = jax.random.PRNGKey(0)
    ws = [jax.random.normal(jax.random.fold_in(k, i), (3, 3, C, C),
                            jnp.bfloat16) * 0.05 for i in range(LAYERS)]
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, F, C), jnp.bfloat16)

    @jax.jit
    def f(x):
        for w in ws:
            h = gn_swish(x, 3, (1, 2))
            x = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        return x

    return chained_time(f, x)


def run_nchw():
    k = jax.random.PRNGKey(0)
    ws = [jax.random.normal(jax.random.fold_in(k, i), (C, C, 3, 3),
                            jnp.bfloat16) * 0.05 for i in range(LAYERS)]
    x = jax.random.normal(jax.random.PRNGKey(1), (B, C, N, F), jnp.bfloat16)

    @jax.jit
    def f(x):
        for w in ws:
            h = gn_swish(x, 1, (2, 3))
            x = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        return x

    return chained_time(f, x)


def run_s2d():
    """Space-to-depth representation: same tensor volume, C=128."""
    k = jax.random.PRNGKey(0)
    c4 = 4 * C
    ws = [jax.random.normal(jax.random.fold_in(k, i), (2, 2, c4, c4),
                            jnp.bfloat16) * 0.05 for i in range(LAYERS)]
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N // 2, F // 2, c4),
                          jnp.bfloat16)

    @jax.jit
    def f(x):
        for w in ws:
            h = gn_swish(x, 3, (1, 2))
            x = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        return x

    return chained_time(f, x)


def run_c128():
    """Control: plain NHWC at C=128 on the half grid (MXU-saturating)."""
    k = jax.random.PRNGKey(0)
    c4 = 4 * C
    ws = [jax.random.normal(jax.random.fold_in(k, i), (3, 3, c4, c4),
                            jnp.bfloat16) * 0.05 for i in range(LAYERS)]
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N // 2, F // 2, c4),
                          jnp.bfloat16)

    @jax.jit
    def f(x):
        for w in ws:
            h = gn_swish(x, 3, (1, 2))
            x = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        return x

    return chained_time(f, x)


VARIANTS = {
    "nhwc": run_nhwc,
    "nchw": run_nchw,
    "s2d": run_s2d,
    "c128": run_c128,
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    gflop = {
        "nhwc": B * N * F * 9 * C * C * 2 / 1e9,
        "nchw": B * N * F * 9 * C * C * 2 / 1e9,
        "s2d": B * (N // 2) * (F // 2) * 4 * (4 * C) ** 2 * 2 / 1e9,
        "c128": B * (N // 2) * (F // 2) * 9 * (4 * C) ** 2 * 2 / 1e9,
    }
    for n in names:
        dt = VARIANTS[n]()
        per_layer = dt / LAYERS
        tf = gflop[n] / per_layer / 1e3
        print(f"{n}: {dt*1e3:.2f} ms/{LAYERS} layers "
              f"({per_layer*1e6:.0f} us/layer, {tf:.1f} TFLOP/s)", flush=True)


if __name__ == "__main__":
    main()
