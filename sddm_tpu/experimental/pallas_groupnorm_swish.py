"""Fused GroupNorm + Swish Pallas kernel.

The GroupNorm->Swish->Conv ``Block`` (reference model/UNetModified2.py:113-124)
is the shared primitive of the whole framed-UNet zoo; its normalization is
memory-bound.  This kernel keeps one (batch row, group) block resident in
VMEM: a single HBM read produces statistics, the normalized+activated output
is written once — no separate reduction kernel, no f32 temporary round-trip.

Layout: NHWC ``[B, H, W, C]`` with ``C = G * cg``.  Grid is ``(B, G)``; each
program handles the full ``[H, W, cg]`` slab of one group (the flagship
shapes make that <= 256*128*32 floats = 4 MB f32, within VMEM).

Falls back to the jnp reference implementation on non-TPU backends (tests run
both and compare, plus interpret mode).

Status: correctness-verified in interpret mode; on this container's
experimental axon PJRT the compiled path trips a known Mosaic scoped-vmem
accounting issue (whole operands counted against the 16MB scoped limit
regardless of blocking), so the model path keeps XLA's fusion for now and the
kernel ships as the validated starting point for real-TPU enabling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, scale_ref, bias_ref, out_ref, s1_ref, s2_ref, *,
            eps: float, n_positions: int):
    # cg == 1 specialization (GroupNorm(C, C) == InstanceNorm — the config
    # the whole zoo ships with): per-channel stats over (H, W), channel axis
    # stays in lanes.  Two sweeps over H tiles per batch row: phase 0
    # accumulates per-channel sum / sum-of-squares into VMEM scratch, phase 1
    # normalizes + activates.  Each tile is read once per sweep — the fused
    # op costs 2 HBM reads + 1 write, with no f32 temporary round-trip.
    phase = pl.program_id(1)
    tile = pl.program_id(2)
    x = x_ref[...].astype(jnp.float32)  # [1, Ht, W, C]

    @pl.when(jnp.logical_and(phase == 0, tile == 0))
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    @pl.when(phase == 0)
    def _():
        s1_ref[...] += jnp.sum(x, axis=(0, 1, 2))
        s2_ref[...] += jnp.sum(jnp.square(x), axis=(0, 1, 2))

    @pl.when(phase == 1)
    def _():
        mean = s1_ref[...] / n_positions
        var = s2_ref[...] / n_positions - jnp.square(mean)
        inv = jax.lax.rsqrt(var + eps)
        y = (x - mean) * inv
        y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(
            jnp.float32
        )
        y = y * jax.nn.sigmoid(y)  # swish
        out_ref[...] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "interpret"))
def group_norm_swish(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: [B, H, W, C]; scale/bias: [C].  Returns swish(groupnorm(x))."""
    b, h, w, c = x.shape
    if c % num_groups != 0:
        raise ValueError(f"channels {c} not divisible by groups {num_groups}")
    if c != num_groups:
        # general grouped case: stats span multiple lane channels — the
        # relayouts cost more than they save; use the XLA path
        return group_norm_swish_reference(x, scale, bias, num_groups, eps)

    # H tiled so each block stays well under VMEM; grid dims:
    # (batch, phase accumulate/normalize, H tile)
    h_tile = h
    for cand in (128, 64, 32, 16, 8):
        if h % cand == 0 and cand * w * c * 4 <= 2 * 1024 * 1024:
            h_tile = cand
            break
    n_tiles = h // h_tile

    # blocked specs are staged through VMEM by the pipeline automatically;
    # setting memory_space=VMEM here would force the FULL operands into VMEM
    block = pl.BlockSpec((1, h_tile, w, c), lambda i, p, t: (i, t, 0, 0))
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, n_positions=h * w),
        grid=(b, 2, n_tiles),
        in_specs=[
            block,
            pl.BlockSpec((c,), lambda i, p, t: (0,)),
            pl.BlockSpec((c,), lambda i, p, t: (0,)),
        ],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((c,), jnp.float32),
            pltpu.VMEM((c,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # the axon PJRT's scoped-vmem accounting counts full operands
            # against the 16MB default even though blocks are tiled; raise
            # the cap (actual per-step residency is ~3 double-buffered tiles)
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, scale, bias)


def group_norm_swish_reference(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """jnp reference (matches flax GroupNorm + swish semantics)."""
    b, h, w, c = x.shape
    cg = c // num_groups
    xg = x.astype(jnp.float32).reshape(b, h, w, num_groups, cg)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    y = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c) * scale + bias
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)
