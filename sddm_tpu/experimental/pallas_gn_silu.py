"""Fused GroupNorm -> SiLU (-> offset mask) for the packed UNet engines.

STATUS: EXPERIMENTAL — measured SLOWER than XLA's own lowering; the
production packed engines keep the jnp path.  On-chip A/B at the
flagship's dominant site ([8,129,65,128] offset grid, chained timing, one
v5e chip): XLA chain 394 us/call, this kernel 759 us/call, outputs equal
to 1 bf16 ulp.  Root cause of the miss: a same-site ablation had suggested
the GN chain cost ~30% of the sampler step, but most of that is the
irreducible normalize/SiLU/mask elementwise work (the statistics reduces
are only ~100 us/step) — XLA's fusions already run that at the VPU/HBM
roofline, while this kernel adds a pad/slice round-trip and a second VMEM
sweep.  Same conclusion as round 2's experimental GN kernels: fusion wins
need a STRUCTURAL traffic reduction (cf. ops/pallas/diffwave_stack.py,
which eliminates inter-layer HBM traffic and does win), not a re-fusion of
ops XLA already fuses.  Kept as a validated, exactness-tested starting
point (tests/test_pallas.py::TestGnSilu).

Semantics (must match models/unet_packed.py::_GN + jax.nn.silu + mask,
elementwise — tests/test_pallas_gn.py):

    s1[c], s2[c] = sum over positions of x32, x32^2      (f32)
    g-sums       = s @ onehot                            (exact f32 dot ==
                                                          the HIGHEST-
                                                          precision matmul
                                                          the XLA path uses)
    mean, var    = s1g/n, max(0, s2g/n - mean^2)         (flax's clamp)
    y            = silu((x32 - mu_c) * rsqrt(var_c+eps) * scale + bias)
    y            = y * offset_mask   (offset sites only; THEN cast bf16)

The group combine broadcasts back per channel via a second tiny onehot
matmul (mu_c = onehot @ mu_g) — no lane gathers, which Mosaic lowers
poorly.  The offset mask (ops/packed.py::offset_mask — zero the two
out-of-range plain rows/cols of the offset grid) is evaluated in-kernel
from the flattened position iota and two per-channel phase vectors, so no
mask tensor is streamed.

Geometry: x is processed as [B, H*W, 4C] (a free reshape of the NHWC
feature map).  Grid (B, 2, chunks): pass 0 accumulates the per-channel
f32 moment sums of each chunk into scratch; pass 1 normalizes and writes.
The x block (one batch row) has a constant index map over (pass, chunk),
so it is fetched from HBM once per row.  The row count H*W is generally
not a multiple of the chunk: the wrapper pads rows up to the chunk size
INSIDE the kernel's masked arithmetic — padded rows fall outside [0, HW)
and are excluded from the statistics by the same position mask, and their
outputs are sliced off by the wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, sc_ref, bi_ref, oh_ref, pa_ref, pb_ref, out_ref,
            s_ref, *, HW, CH, C4, G, n, eps, H, W, offset):
    b = pl.program_id(0)
    ph = pl.program_id(1)
    ch = pl.program_id(2)
    nch = pl.num_programs(2)
    base = ch * CH

    # rows beyond HW are the wrapper's zero padding: they add 0 to the
    # statistics and their outputs are sliced off
    rows = jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0) + base
    x = x_ref[0, pl.ds(base, CH), :].astype(jnp.float32)

    @pl.when(ph == 0)
    def _stats():
        @pl.when(ch == 0)
        def _zero():
            s_ref[...] = jnp.zeros_like(s_ref)

        s_ref[0:1, :] += jnp.sum(x, axis=0, keepdims=True)
        s_ref[1:2, :] += jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(ph == 1)
    def _normalize():
        s1g = jnp.dot(s_ref[0:1, :], oh_ref[...],
                      preferred_element_type=jnp.float32)   # [1, G]
        s2g = jnp.dot(s_ref[1:2, :], oh_ref[...],
                      preferred_element_type=jnp.float32)
        mean_g = s1g / n
        var_g = jnp.maximum(0.0, s2g / n - mean_g * mean_g)
        iv_g = jax.lax.rsqrt(var_g + eps)
        # broadcast back per channel: onehot rows are one-hot over groups
        mu_c = jnp.dot(mean_g, oh_ref[...].T,
                       preferred_element_type=jnp.float32)  # [1, C4]
        iv_c = jnp.dot(iv_g, oh_ref[...].T,
                       preferred_element_type=jnp.float32)
        y = (x - mu_c) * iv_c * sc_ref[0:1, :] + bi_ref[0:1, :]
        y = y * jax.nn.sigmoid(y)  # silu, f32 (cast-order quality fix)
        if offset:
            # offset-grid mask: plain row -1 (block 0 phase 0) and plain
            # row H (last block phase 1) are out of range; same per column
            h = rows // W
            w = rows - h * W
            row_ok = (1.0
                      - (h == 0).astype(jnp.float32) * pa_ref[0:1, :]
                      - (h == H - 1).astype(jnp.float32) * pa_ref[1:2, :])
            col_ok = (1.0
                      - (w == 0).astype(jnp.float32) * pb_ref[0:1, :]
                      - (w == W - 1).astype(jnp.float32) * pb_ref[1:2, :])
            y = y * row_ok * col_ok
        out_ref[0, pl.ds(base, CH), :] = y.astype(out_ref.dtype)


def gn_silu(x, scale, bias, onehot, *, count, eps=1e-5, offset=False,
            interpret: bool = False):
    """Fused GroupNorm + SiLU (+ offset mask) on a packed feature map.

    x:      [B, H, W, 4C]  (bf16 or f32)
    scale:  [4C] f32 — already gathered into packed channel order
    bias:   [4C] f32
    onehot: [4C, G] f32 — packed channel -> group indicator
    count:  packed channels per group per spatial position (plan count)
    offset: True at offset-grid sites — divisor uses (H-1)(W-1) and the
            out-of-range plain rows/cols are zeroed after the SiLU
    """
    B, H, W, C4 = x.shape
    G = onehot.shape[1]
    HW = H * W
    n = float(((H - 1) * (W - 1) if offset else H * W) * count)
    CH = 1024
    nch = -(-HW // CH)
    HWp = nch * CH

    # per-channel phase indicators for the in-kernel offset mask
    c = C4 // 4
    ph_a = (jnp.arange(C4) // (2 * c)) % 2   # phase row bit
    ph_b = (jnp.arange(C4) // c) % 2         # phase col bit
    pa = jnp.stack([(ph_a == 0), (ph_a == 1)]).astype(jnp.float32)  # [2, C4]
    pb = jnp.stack([(ph_b == 0), (ph_b == 1)]).astype(jnp.float32)

    kernel = functools.partial(
        _kernel, HW=HW, CH=CH, C4=C4, G=G, n=n, eps=eps, H=H, W=W,
        offset=offset)

    y = pl.pallas_call(
        kernel,
        grid=(B, 2, nch),
        in_specs=[
            pl.BlockSpec((1, HWp, C4), lambda b, ph, ch: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scale [1, C4]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias  [1, C4]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # onehot [C4, G]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pa [2, C4]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pb [2, C4]
        ],
        out_specs=pl.BlockSpec((1, HWp, C4), lambda b, ph, ch: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HWp, C4), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, C4), jnp.float32),        # s1 / s2 accumulators
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.pad(x.reshape(B, HW, C4), ((0, 0), (0, HWp - HW), (0, 0))),
      scale.reshape(1, C4).astype(jnp.float32),
      bias.reshape(1, C4).astype(jnp.float32), onehot.astype(jnp.float32),
      pa, pb)
    return y[:, :HW].reshape(B, H, W, C4)
