"""Fused DiffWave residual stack — one Pallas kernel for all L layers.

Why a kernel at all: the DiffWave reverse sampler is HBM-bound, not
MXU-bound.  XLA lowers the 30 gated residual layers
(reference model/diffwave.py:64-108) to per-layer chains that materialize
every intermediate ([B, T, 2C] pre-gate, [B, T, C] gated, res, skip, x')
in HBM — an on-chip trace of the shipped recipe (T=16384, batch 8) shows
~7.9 ms/step of which >5 ms is elementwise fusions running at the HBM
roofline plus a degenerate C_in=1 stem conv.  This kernel keeps one batch
row's signal resident in VMEM across ALL layers: per step it reads x once,
streams the (hoisted, loop-invariant) conditioner projections, and writes
only the skip sum — the layer intermediates never touch HBM.

Layer math (reference semantics, models/diffwave.py):

    for l in range(L):
        d        = 1 << (l % cycle)
        y        = dilated_conv_l(x + emb_d[l]) + cond[l]   # [B, T, 2C]
        g        = sigmoid(y[:, :, :C]) * tanh(y[:, :, C:])
        rs       = g @ wrs[l] + brs[l]                      # [B, T, 2C]
        x        = (x + rs[:, :, :C]) * rsqrt(2)
        skip    += rs[:, :, C:]                             # bf16 adds,
    return skip                                             # like flax

``cond`` must already contain the per-layer conditioner projection PLUS the
dilated conv's bias (both loop-invariant across sampler steps — the engine
hoists them; XLA's LICM keeps the hoisted chain outside the sampling loop).

Kernel geometry: grid ``(B, L, T/TC)`` iterated serially on one core.  Two
x rows ([T + 2*PAD, C] each) ping-pong in VMEM scratch between consecutive
layers.  SAME zero-padding of the conv input (x + emb_l) is exact: the pad
regions hold ``-emb_l`` sentinels (swapped as layers advance), so after the
per-tap ``+ emb_l`` every out-of-range tap contributes exactly 0 —
bit-identical to flax's zero-padded bf16 ``x + d``.  The skip sum
accumulates in the resident output block (its index map is constant across
(l, tc), so the block flushes once per batch row), in bf16, matching the
flax path's sequential bf16 adds.

Dilated taps: Mosaic cannot index the sublane dim at a dynamic offset that
is not provably a multiple of 8, and ``tpu.dynamic_rotate`` (a) only
supports 32-bit data and (b) measured ~10x slower than everything else in
this kernel.  So the kernel splits per dilation class into two predicated
paths, each running the full gate/matmul/store tail (A/B'd faster than a
shared tail through an accumulator scratch): d >= 8 taps are aligned
dynamic slices of the x scratch; d in {1, 2, 4} taps are static slices of
one aligned [TC+16, C] window (constant-offset slices lower to cheap
register shifts) selected by class.

Per-layer lookups (emb vectors, biases) are flattened to [L*B, 1, .] /
[L, 1, .] so the dynamic index lands on an untiled leading dim.

Design A/Bs on one v5e chip (shipped recipe B=8, T=16384, C=64, L=30,
chained-scan timing; XLA baseline for the SAME 30 layers ~6.5 ms within a
7.9 ms step): dynamic rotates 15.1 ms; branch-free select taps + folded-
emb corrections 12.1 ms; 9-tap static weight expansion 10.3 ms; predicated
paths + accumulator scratch 7.9 ms; THIS shape (predicated paths, inline
tails, sentinel pads, TC=4096) 5.9 ms.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RSQRT2 = 1.0 / math.sqrt(2.0)


def _kernel(x0_ref, cond_ref, emb_ref, wconv_ref, wrs_ref, brs_ref,
            out_ref, xs_ref, *, B, T, TC, PAD, C, cycle, mm_dtype):
    b = pl.program_id(0)
    l = pl.program_id(1)
    tc = pl.program_id(2)
    ntc = pl.num_programs(2)
    L = pl.num_programs(1)
    parity = jax.lax.rem(l, 2)
    jclass = jax.lax.rem(l, cycle)
    d = jax.lax.shift_left(1, jclass)
    base = tc * TC
    em = emb_ref[l * B + b, 0, :][None, :]  # [1, C], kernel dtype

    @pl.when(jnp.logical_and(l == 0, tc == 0))
    def _load_row():
        xs_ref[0, PAD:PAD + T, :] = x0_ref[0]
        # sentinel pads: -emb_0, so (pad + emb_0) == 0 — flax's SAME
        # zero padding of the conv input (x + emb)
        xs_ref[0, 0:PAD, :] = jnp.broadcast_to(-em, (PAD, C))
        xs_ref[0, PAD + T:PAD + T + PAD, :] = jnp.broadcast_to(-em, (PAD, C))

    def tail(acc):
        y = acc + cond_ref[0, 0, :, :].astype(jnp.float32)  # [TC, 2C] f32
        g = jax.nn.sigmoid(y[:, :C]) * jnp.tanh(y[:, C:])
        rs = jnp.dot(g.astype(mm_dtype), wrs_ref[0],
                     preferred_element_type=jnp.float32)
        rs = rs + brs_ref[l, 0, :].astype(jnp.float32)[None, :]

        x_old = xs_ref[parity, pl.ds(PAD + base, TC), :]
        x_new = (x_old.astype(jnp.float32) + rs[:, :C]) * _RSQRT2
        xs_ref[1 - parity, pl.ds(PAD + base, TC), :] = x_new.astype(
            xs_ref.dtype)

        # skip accumulation in the resident output block (bf16, matching
        # the flax path's sequential bf16 adds)
        sk = rs[:, C:].astype(out_ref.dtype)
        prev = out_ref[0, pl.ds(base, TC), :]
        out_ref[0, pl.ds(base, TC), :] = jnp.where(l == 0, sk, prev + sk)

    def dots(tm, tcen, tp):
        acc = jnp.dot(tm, wconv_ref[0, 0, :, :],
                      preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(tcen, wconv_ref[0, 1, :, :],
                            preferred_element_type=jnp.float32)
        return acc + jnp.dot(tp, wconv_ref[0, 2, :, :],
                             preferred_element_type=jnp.float32)

    @pl.when(jclass <= 2)
    def _small_d():
        win = xs_ref[parity, pl.ds(base + PAD - 8, TC + 16), :] + em

        def side(sign):
            s1 = win[8 + sign * 1:8 + sign * 1 + TC, :]
            s2 = win[8 + sign * 2:8 + sign * 2 + TC, :]
            s4 = win[8 + sign * 4:8 + sign * 4 + TC, :]
            return jnp.where(jclass == 0, s1,
                             jnp.where(jclass == 1, s2, s4))

        tail(dots(side(-1), win[8:8 + TC, :], side(+1)))

    @pl.when(jclass > 2)
    def _large_d():
        def tap(sign):
            start = pl.multiple_of(PAD + base + sign * d, 8)
            return xs_ref[parity, pl.ds(start, TC), :] + em

        tail(dots(tap(-1), tap(0), tap(+1)))

    # swap the sentinel pads to -emb_{l+1} for the buffer layer l+1 reads
    @pl.when(jnp.logical_and(tc == ntc - 1, l + 1 < L))
    def _next_pads():
        nem = emb_ref[(l + 1) * B + b, 0, :][None, :]
        xs_ref[1 - parity, 0:PAD, :] = jnp.broadcast_to(-nem, (PAD, C))
        xs_ref[1 - parity, PAD + T:PAD + T + PAD, :] = jnp.broadcast_to(
            -nem, (PAD, C))


def _pick_tc(T: int, vmem_cap: int) -> int:
    # bigger chunks = fewer grid steps; capped by the VMEM budget for the
    # f32 gate temporaries
    for tc in (vmem_cap, 4096, 2048, 1024, 512, 256, 128):
        if tc <= vmem_cap and T % tc == 0:
            return tc
    raise ValueError(
        f"diffwave_stack needs T divisible by 128 (got T={T})")


def diffwave_stack(x0, cond, emb_d, wconv, wrs, brs, *, cycle: int,
                   interpret: bool = False, max_tc: int = 4096):
    """Run the full gated residual stack; returns the skip sum.

    x0:    [B, T, C]     stem output (post-relu)
    cond:  [L, B, T, 2C] per-layer conditioner projection + dilated-conv bias
    emb_d: [L, B, C]     per-layer Dense(diffusion_emb) outputs
    wconv: [L, 3, C, 2C] dilated conv kernels
    wrs:   [L, C, 2C]    concat(res kernel, skip kernel) along the out axis
    brs:   [L, 1, 2C]    concat(res bias, skip bias)
    cycle: dilation cycle length (dilation of layer l = 2**(l % cycle))
    """
    B, T, C = x0.shape
    L = wconv.shape[0]
    TC = _pick_tc(T, max_tc)
    PAD = 2 ** ((L - 1) % cycle if L < cycle else cycle - 1)
    PAD = max(PAD, 8)
    mm_dtype = x0.dtype if x0.dtype != jnp.float32 else jnp.float32

    kernel = functools.partial(
        _kernel, B=B, T=T, TC=TC, PAD=PAD, C=C, cycle=cycle,
        mm_dtype=mm_dtype)

    return pl.pallas_call(
        kernel,
        grid=(B, L, T // TC),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda b, l, tc: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TC, 2 * C), lambda b, l, tc: (l, b, tc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # emb_d (tiny, whole)
            pl.BlockSpec((1, 3, C, 2 * C), lambda b, l, tc: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 2 * C), lambda b, l, tc: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # brs (tiny, whole)
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda b, l, tc: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x0.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, T + 2 * PAD, C), x0.dtype),   # ping-pong x rows
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # the compiler's default scoped-vmem budget is 16 MB; the
            # resident set at big TC exceeds it but stays well within the
            # v5e core's physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x0, cond, emb_d.astype(x0.dtype).reshape(L * B, 1, C),
      wconv, wrs, brs)


def diffwave_stack_reference(x0, cond, emb_d, wconv, wrs, brs, *, cycle: int):
    """Pure-JAX reference of the stacked-weight layer loop (same math as the
    kernel and as the flax forward); the non-TPU fallback path."""
    L = wconv.shape[0]
    C = x0.shape[-1]

    def layer(carry, inputs):
        x, skip = carry
        cond_l, emb_l, wconv_l, wrs_l, brs_l, l = inputs
        xd = x + emb_l[:, None, :]  # emb_l: [B, C]
        dil = jnp.left_shift(1, jnp.mod(l, cycle))
        # dilated SAME conv as three shifted matmuls with zero padding
        T = x.shape[1]
        y = jnp.zeros(x.shape[:2] + (2 * C,), jnp.float32)
        for k in range(3):
            off = (k - 1) * dil
            idx = jnp.arange(T) + off
            valid = (idx >= 0) & (idx < T)
            tap = jnp.take(xd, jnp.clip(idx, 0, T - 1), axis=1)
            tap = jnp.where(valid[None, :, None], tap, 0)
            y = y + jnp.einsum(
                "btc,cf->btf", tap.astype(jnp.float32),
                wconv_l[k].astype(jnp.float32))
        y = y + cond_l.astype(jnp.float32)
        g = jax.nn.sigmoid(y[..., :C]) * jnp.tanh(y[..., C:])
        rs = jnp.einsum("btc,cf->btf", g.astype(x.dtype).astype(jnp.float32),
                        wrs_l.astype(jnp.float32)) + brs_l.astype(jnp.float32)
        x = ((x.astype(jnp.float32) + rs[..., :C]) * _RSQRT2).astype(x.dtype)
        skip = skip + rs[..., C:].astype(skip.dtype)
        return (x, skip), None

    skip0 = jnp.zeros_like(x0)
    (x, skip), _ = jax.lax.scan(
        layer, (x0, skip0),
        (cond, emb_d, wconv, wrs, brs, jnp.arange(L)))
    return skip
