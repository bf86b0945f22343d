"""Space-to-depth ("packed") convolution transforms.

The flagship UNet's level-0/1 activations have C=32/64 channels; TPU tiled
layouts pad the channel (lane) axis to 128, so every conv and every HBM
round-trip runs at a fraction of peak (measured 7.2 TFLOP/s for the C=32
3x3 conv vs 54 TFLOP/s for the same FLOPs at C=128 — tools/layout_probe.py).

This module re-expresses the SAME math on a 2x2-space-to-depth
representation: ``[B, N, F, C] -> [B, N/2, F/2, 4C]`` with packed channel
``phase * C + c`` where ``phase = 2*(row parity) + (col parity)``.  Every
conv of the UNet maps to an equivalent conv on packed tensors whose kernel
is a fixed sparse rearrangement of the original kernel — built here by
explicit index construction and verified elementwise in
tests/test_packed.py.  Weights stay checkpoint-compatible: kernels are
packed once on the host (outside jit) by ``models/unet_packed.py``.

Derivations (0-based taps t = dh+1; a/a' are row parities of the output /
input position, e is the packed-space tap offset):
  - stride-1 3x3 SAME:   dh = 2(e-1) + a' - a,  e in {0,1,2}  -> 3x3 packed
  - stride-2 3x3 pad 1, packed->unpacked half grid:
                         dh = 2(e-1) + a',      e in {0,1}    -> 2x2, pad (1,0)
  - stride-2 3x3 pad 1, packed->packed quarter grid:
                         dh = 2(e-1) + a' - 2a, e in {0,1,2}  -> 3x3 s2 pad 1
  - nearest-2x-up + 3x3 SAME, unpacked->packed (same grid):
                         dh = (2(e-1) + a + 1) ... built by summing the taps
    each input pixel reaches through both duplicated rows (no FLOP overhead:
    kernel [3,3,Ci,4Co] on the un-upsampled grid).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def s2d(x: jnp.ndarray) -> jnp.ndarray:
    """[B, N, F, C] -> [B, N/2, F/2, 4C], packed channel = phase*C + c."""
    b, n, f, c = x.shape
    x = x.reshape(b, n // 2, 2, f // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, N/2, F/2, a, b, C]
    return x.reshape(b, n // 2, f // 2, 4 * c)


def d2s(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`s2d`."""
    b, n2, f2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, n2, f2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, N/2, a, F/2, b, C]
    return x.reshape(b, n2 * 2, f2 * 2, c)


def _phase_index(a: int, b: int, c: np.ndarray, n_ch: int) -> np.ndarray:
    return (2 * a + b) * n_ch + c


def pack_kernel_s1(w: np.ndarray) -> np.ndarray:
    """Stride-1 SAME 3x3 (or 1x1) kernel [kh, kw, Ci, Co] ->
    packed [3, 3, 4Ci, 4Co] (or [1, 1, 4Ci, 4Co] for 1x1):
    conv(x, w, SAME) == d2s(conv(s2d(x), w', SAME))."""
    kh, kw, ci, co = w.shape
    if (kh, kw) == (1, 1):
        out = np.zeros((1, 1, 4 * ci, 4 * co), w.dtype)
        for p in range(4):
            out[0, 0, p * ci:(p + 1) * ci, p * co:(p + 1) * co] = w[0, 0]
        return out
    assert (kh, kw) == (3, 3), "only 1x1 and 3x3 stride-1 kernels"
    out = np.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    rng_ci, rng_co = np.arange(ci), np.arange(co)
    for e in range(3):
        for f in range(3):
            for a_in in range(2):
                for b_in in range(2):
                    for a in range(2):
                        for b in range(2):
                            dh = 2 * (e - 1) + a_in - a
                            dw = 2 * (f - 1) + b_in - b
                            if not (-1 <= dh <= 1 and -1 <= dw <= 1):
                                continue
                            pi = _phase_index(a_in, b_in, rng_ci, ci)
                            po = _phase_index(a, b, rng_co, co)
                            out[e, f, pi[:, None], po[None, :]] = \
                                w[dh + 1, dw + 1]
    return out


def pack_kernel_s1_to_offset(w: np.ndarray) -> np.ndarray:
    """Stride-1 SAME 3x3 kernel [3, 3, Ci, Co] -> [2, 2, 4Ci, 4Co], consumed
    with padding (1,1) on a STANDARD-packed input and producing the
    OFFSET-packed grid (offset block i = plain rows {2i-1, 2i}, so the
    output has one extra block per spatial axis; plain rows -1 and H land
    at block 0 phase 0 / block h phase 1 and must be masked downstream —
    :func:`offset_mask`).

    Why: the dense 3x3 packed kernel (pack_kernel_s1) is only 1/4 nonzero,
    so the MXU does 4x the plain conv's FLOPs; this 2x2 form is 9/16
    nonzero — 2.25x fewer FLOPs for the SAME math at full lane width.
    Derivation (1-D): output offset block i phase a is plain row 2i-1+a;
    tap e in {0,1} reads standard block i-1+e phase a_in = plain row
    2(i-1+e)+a_in, so dh = 2(e-1) + a_in - a + 1, kept when |dh| <= 1."""
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3), "offset packing is for 3x3 stride-1 kernels"
    out = np.zeros((2, 2, 4 * ci, 4 * co), w.dtype)
    rng_ci, rng_co = np.arange(ci), np.arange(co)
    for e in range(2):
        for f in range(2):
            for a_in in range(2):
                for b_in in range(2):
                    for a in range(2):
                        for b in range(2):
                            dh = 2 * (e - 1) + a_in - a + 1
                            dw = 2 * (f - 1) + b_in - b + 1
                            if not (-1 <= dh <= 1 and -1 <= dw <= 1):
                                continue
                            pi = _phase_index(a_in, b_in, rng_ci, ci)
                            po = _phase_index(a, b, rng_co, co)
                            out[e, f, pi[:, None], po[None, :]] = \
                                w[dh + 1, dw + 1]
    return out


def pack_kernel_s1_from_offset(w: np.ndarray) -> np.ndarray:
    """Stride-1 SAME 3x3 kernel [3, 3, Ci, Co] -> [2, 2, 4Ci, 4Co], consumed
    with VALID padding on an OFFSET-packed input (whose two out-of-range
    plain rows/cols are pre-zeroed — they coincide exactly with the plain
    conv's SAME-padding zeros) and producing the STANDARD-packed grid.

    Derivation (1-D): output standard block i phase a is plain row 2i+a;
    tap e in {0,1} reads offset block i+e phase a_in = plain row
    2(i+e)-1+a_in, so dh = 2e + a_in - a - 1, kept when |dh| <= 1."""
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3), "offset packing is for 3x3 stride-1 kernels"
    out = np.zeros((2, 2, 4 * ci, 4 * co), w.dtype)
    rng_ci, rng_co = np.arange(ci), np.arange(co)
    for e in range(2):
        for f in range(2):
            for a_in in range(2):
                for b_in in range(2):
                    for a in range(2):
                        for b in range(2):
                            dh = 2 * e + a_in - a - 1
                            dw = 2 * f + b_in - b - 1
                            if not (-1 <= dh <= 1 and -1 <= dw <= 1):
                                continue
                            pi = _phase_index(a_in, b_in, rng_ci, ci)
                            po = _phase_index(a, b, rng_co, co)
                            out[e, f, pi[:, None], po[None, :]] = \
                                w[dh + 1, dw + 1]
    return out


def offset_mask(h_off: int, w_off: int, c: int,
                dtype=np.float32) -> np.ndarray:
    """{0,1} mask [h_off, w_off, 4c] zeroing an OFFSET-packed tensor's two
    out-of-range plain rows/cols (plain row -1 = block 0 phase 0, plain row
    H = last block phase 1; same per column).  Multiply after the producing
    conv (so GroupNorm statistics see zeros there) and again after any
    nonlinearity/bias before the consuming conv (VALID-padding semantics
    require those positions to be exactly the plain conv's SAME zeros)."""
    mr = np.ones((h_off, 2), dtype)
    mr[0, 0] = 0.0
    mr[-1, 1] = 0.0
    mc = np.ones((w_off, 2), dtype)
    mc[0, 0] = 0.0
    mc[-1, 1] = 0.0
    m4 = np.einsum("ia,jb->ijab", mr, mc).reshape(h_off, w_off, 4)
    return np.repeat(m4, c, axis=-1)


def pack_kernel_s2_unpacked_out(w: np.ndarray) -> np.ndarray:
    """Stride-2 3x3 pad (1,1) kernel [3, 3, Ci, Co] -> packed [2, 2, 4Ci, Co].
    torch-style downsample: conv_s2(x, w, pad 1) == conv_s1(s2d(x), w',
    pad ((1,0),(1,0))) — output lands on the half grid, unpacked."""
    _, _, ci, co = w.shape
    out = np.zeros((2, 2, 4 * ci, co), w.dtype)
    rng_ci = np.arange(ci)
    for e in range(2):
        for f in range(2):
            for a_in in range(2):
                for b_in in range(2):
                    dh = 2 * (e - 1) + a_in
                    dw = 2 * (f - 1) + b_in
                    if not (-1 <= dh <= 1 and -1 <= dw <= 1):
                        continue
                    pi = _phase_index(a_in, b_in, rng_ci, ci)
                    out[e, f, pi] = w[dh + 1, dw + 1]
    return out


def pack_kernel_s2_packed_out(w: np.ndarray) -> np.ndarray:
    """Stride-2 3x3 pad (1,1) kernel [3, 3, Ci, Co] -> packed
    [3, 3, 4Ci, 4Co], applied with stride 2 pad (1,1) on packed input;
    output is the next level's PACKED representation (quarter grid)."""
    _, _, ci, co = w.shape
    out = np.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    rng_ci, rng_co = np.arange(ci), np.arange(co)
    for e in range(3):
        for f in range(3):
            for a_in in range(2):
                for b_in in range(2):
                    for a in range(2):
                        for b in range(2):
                            dh = 2 * (e - 1) + a_in - 2 * a
                            dw = 2 * (f - 1) + b_in - 2 * b
                            if not (-1 <= dh <= 1 and -1 <= dw <= 1):
                                continue
                            pi = _phase_index(a_in, b_in, rng_ci, ci)
                            po = _phase_index(a, b, rng_co, co)
                            out[e, f, pi[:, None], po[None, :]] = \
                                w[dh + 1, dw + 1]
    return out


def pack_kernel_upsample(w: np.ndarray) -> np.ndarray:
    """Nearest-2x-upsample + 3x3 SAME conv, fused: kernel [3, 3, Ci, Co] ->
    [3, 3, Ci, 4Co] consuming the UN-upsampled (unpacked) input grid and
    producing the PACKED representation of the upsampled grid (same spatial
    size as the input).  Because nearest duplication feeds each input pixel
    through two adjacent rows, taps that alias the same source pixel SUM."""
    _, _, ci, co = w.shape
    out = np.zeros((3, 3, ci, 4 * co), w.dtype)
    rng_co = np.arange(co)
    # output packed row i, phase a  <=>  upsampled row 2i+a; conv tap dh
    # reads upsampled row 2i+a+dh = duplicated from input row (2i+a+dh)//2
    # = i + e-1 with e-1 = floor((a+dh)/2).
    for a in range(2):
        for b in range(2):
            for dh in (-1, 0, 1):
                for dw in (-1, 0, 1):
                    e = (a + dh) // 2 + 1
                    f = (b + dw) // 2 + 1
                    po = _phase_index(a, b, rng_co, co)
                    out[e, f, :, po] += w[dh + 1, dw + 1].T
    return out


# ---- differentiable (traced) kernel packing --------------------------------
#
# Every pack_kernel_* transform above is LINEAR in the weights: each packed
# entry is a sum of (at most a few) original entries.  For the packed
# TRAINING path (models/unet_packed.py::PackedTrainUNetModified2) the
# transforms must run inside jit on traced weights so autodiff accumulates
# each original weight's gradient from all of its packed copies.  The index
# maps are derived by PROBING the numpy builders with index-carrier arrays —
# guaranteeing the traced transforms can never drift from the host-side ones.

from functools import lru_cache


def _derive_map(builder, shape):
    """Source-index map of a single-assignment linear kernel transform.

    Probes ``builder`` with ``flat_index + 1`` carriers; output entries the
    builder left at zero map to -1."""
    idx = np.arange(int(np.prod(shape)), dtype=np.float64).reshape(shape) + 1.0
    out = builder(idx)
    m = np.rint(out).astype(np.int64) - 1
    # Self-check: the probe is only valid for single-source, coefficient-1
    # copy transforms.  A builder that sums or scales taps would rint to a
    # plausible-but-wrong source index — catch that by replaying the derived
    # map on random data and comparing with the builder's own output.
    rng = np.random.default_rng(0)
    probe = rng.standard_normal(shape)
    replay = np.where(
        m >= 0, probe.reshape(-1)[np.where(m >= 0, m, 0)], 0.0
    )
    if not np.allclose(replay, builder(probe)):
        raise AssertionError(
            "_derive_map: builder is not a single-source copy transform; "
            "derived index map does not reproduce its output"
        )
    return m


@lru_cache(maxsize=None)
def _kernel_map(kind: str, shape) -> tuple:
    """(tap maps) for a pack transform; tuple of int arrays, -1 == zero."""
    shape = tuple(shape)
    if kind == "s1":
        return (_derive_map(pack_kernel_s1, shape),)
    if kind == "s1to":
        return (_derive_map(pack_kernel_s1_to_offset, shape),)
    if kind == "s1from":
        return (_derive_map(pack_kernel_s1_from_offset, shape),)
    if kind == "s2u":
        return (_derive_map(pack_kernel_s2_unpacked_out, shape),)
    if kind == "s2p":
        return (_derive_map(pack_kernel_s2_packed_out, shape),)
    if kind == "up":
        # the upsample transform SUMS aliased taps; probe one tap at a time
        # (per-tap maps are single-source) and sum the gathers at apply time
        maps = []
        base = np.arange(int(np.prod(shape)), dtype=np.float64).reshape(shape)
        for dh in range(3):
            for dw in range(3):
                probe = np.zeros(shape, np.float64)
                probe[dh, dw] = base[dh, dw] + 1.0
                m = np.rint(pack_kernel_upsample(probe)).astype(np.int64) - 1
                if (m >= 0).any():
                    maps.append(m)
        return tuple(maps)
    raise ValueError(kind)


def _apply_map(w: jnp.ndarray, src: np.ndarray) -> jnp.ndarray:
    g = jnp.take(w.reshape(-1), np.where(src >= 0, src, 0).reshape(-1),
                 axis=0).reshape(src.shape)
    return jnp.where(src >= 0, g, jnp.zeros((), w.dtype))


def pack_kernel_traced(kind: str, w: jnp.ndarray) -> jnp.ndarray:
    """Traced/differentiable equivalent of the pack_kernel_* transforms.

    ``kind``: "s1" | "s1to" | "s1from" | "s2u" | "s2p" | "up".  Identical
    output to the numpy
    builders (asserted in tests/test_packed.py::TestTracedKernelPacking)."""
    maps = _kernel_map(kind, tuple(int(s) for s in w.shape))
    out = _apply_map(w, maps[0])
    for m in maps[1:]:
        out = out + _apply_map(w, m)
    return out


# ---- gather-free (slice + concat) kernel packing ----------------------------
#
# pack_kernel_traced expresses the transforms as flat-index weight GATHERS
# (jnp.take).  In-graph gathers reading donated parameter buffers are the
# suspected trigger of the axon PJRT packed-training miscompute
# (artifacts/nan_repro/), so this second traced implementation builds the
# SAME packed kernels with zero gather/scatter ops: each [Ci, Co] block of
# the packed kernel is a static slice of ``w`` (or a sum of a few), and the
# blocks are assembled with jnp.concatenate.  The per-block source taps are
# probe-derived from the numpy builders at ci = co = 1 (every builder writes
# whole blocks, uniformly over channels), so the two traced paths and the
# host path can never drift.

_BUILDERS = {
    "s1": pack_kernel_s1,
    "s1to": pack_kernel_s1_to_offset,
    "s1from": pack_kernel_s1_from_offset,
    "s2u": pack_kernel_s2_unpacked_out,
    "s2p": pack_kernel_s2_packed_out,
    "up": pack_kernel_upsample,
}


def _block_plan(kind: str, kh: int, kw: int):
    """Per packed-kernel block (e, f, pi, po): the list of source taps
    (flattened dh*kw+dw) whose [Ci, Co] slices SUM to that block."""
    builder = _BUILDERS[kind]
    plans = None
    shape = None
    for t in range(kh * kw):
        w = np.zeros((kh, kw, 1, 1))
        w[t // kw, t % kw, 0, 0] = 1.0
        out = builder(w)
        if plans is None:
            shape = out.shape  # (E, F, NPI, NPO) at ci = co = 1
            plans = np.zeros(shape + (kh * kw,), np.int64)
        counts = np.rint(out).astype(np.int64)
        assert np.allclose(out, counts), "non-integer block coefficient"
        plans[..., t] = counts
    return plans, shape


_BLOCK_PLANS: dict = {}


def pack_kernel_blocks(kind: str, w: jnp.ndarray) -> jnp.ndarray:
    """Gather-free traced equivalent of :func:`pack_kernel_traced`: the
    packed kernel assembled purely from static slices of ``w``, adds, and
    concatenations (verified identical in tests/test_packed.py)."""
    kh, kw, ci, co = (int(s) for s in w.shape)
    key = (kind, kh, kw)
    if key not in _BLOCK_PLANS:
        _BLOCK_PLANS[key] = _block_plan(kind, kh, kw)
    plans, (E, F, NPI, NPO) = _BLOCK_PLANS[key]
    zero = jnp.zeros((ci, co), w.dtype)
    efs = []
    for e in range(E):
        for f in range(F):
            rows = []
            for pi in range(NPI):
                blocks = []
                for po in range(NPO):
                    acc = None
                    for t in range(kh * kw):
                        n = int(plans[e, f, pi, po, t])
                        if n == 0:
                            continue
                        term = w[t // kw, t % kw]
                        if n > 1:
                            term = term * n
                        acc = term if acc is None else acc + term
                    blocks.append(zero if acc is None else acc)
                rows.append(
                    jnp.concatenate(blocks, axis=1) if NPO > 1 else blocks[0]
                )
            efs.append(
                jnp.concatenate(rows, axis=0) if NPI > 1 else rows[0]
            )
    return jnp.stack(efs, 0).reshape(E, F, NPI * ci, NPO * co)


def onehot_take(x: jnp.ndarray, idx: np.ndarray) -> jnp.ndarray:
    """Gather-free ``x[idx]`` for 1-D x with a static index vector: a {0,1}
    matmul (exact — exactly one nonzero per output row)."""
    sel = np.zeros((len(idx), int(x.shape[0])), np.float32)
    sel[np.arange(len(idx)), np.asarray(idx)] = 1.0
    return jnp.asarray(sel, x.dtype) @ x


def onehot_unperm_axis2(w: jnp.ndarray, perm: np.ndarray) -> jnp.ndarray:
    """Gather-free equivalent of ``jnp.take(w, argsort(perm), axis=2)`` for
    kernels [kh, kw, C, Co]: a one-hot contraction over the input-channel
    axis."""
    inv = np.argsort(np.asarray(perm))
    sel = np.zeros((len(inv), int(w.shape[2])), np.float32)
    sel[np.arange(len(inv)), inv] = 1.0
    return jnp.einsum("ji,hwio->hwjo", jnp.asarray(sel, w.dtype), w)


def pack_input_map(sections) -> np.ndarray:
    """Channel permutation mapping concat(packed(x1), packed(x2), ...) to
    packed(concat(x1, x2, ...)).

    ``sections``: per-tensor channel counts (c1, c2, ...).  Returns an index
    array ``perm`` with packed(concat)[..., j] == concat(packed)[..., perm[j]]
    — apply to an already-concatenated packed tensor before a conv whose
    kernel was packed for the concatenated channel layout."""
    total = sum(sections)
    perm = np.zeros(4 * total, np.int64)
    offsets = np.cumsum([0] + list(sections))
    for phase in range(4):
        for t, c in enumerate(sections):
            # packed(concat) channel = phase*total + offset_t + c_i
            # concat(packed) channel = 4*offset_t + phase*c + c_i
            dst = phase * total + offsets[t] + np.arange(c)
            src = 4 * offsets[t] + phase * c + np.arange(c)
            perm[dst] = src
    return perm
