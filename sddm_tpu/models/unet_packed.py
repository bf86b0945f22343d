"""Packed (space-to-depth) inference engine for UNetModified2.

Mathematically EXACT reformulation of the flagship forward
(models/unet_modified2.py) on 2x2 space-to-depth tensors: every level-l
activation [B, N/2^l, F/2^l, C] becomes [B, N/2^{l+1}, F/2^{l+1}, 4C], so
convs contract/produce >=128 channels and tiled TPU layouts stop padding the
lane axis (C=32 convs measure 7.2 TFLOP/s; the same math packed measures
~54 TFLOP/s — tools/layout_probe.py).  Checkpoints are shared with the
standard model: ``pack_params`` rearranges the flax param tree ONCE on the
host (kernel transforms from ops/packed.py), and ``apply`` mirrors the
module's call contract, so ``SDDM(schedule, PackedUNetModified2(net))``
drops into the existing sampler unchanged.

GroupNorm on packed tensors: per-group statistics are computed with a
static one-hot [4C, groups] matmul (MXU-friendly), supporting concatenated
skip inputs whose packed channel order interleaves sections; scale/bias are
pre-gathered per packed channel.

Exactness vs the flax model is asserted elementwise in
tests/test_packed_model.py.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.framing import frame_signal, overlap_add
from ..ops.packed import (
    offset_mask,
    onehot_take,
    onehot_unperm_axis2,
    pack_kernel_blocks,
    pack_kernel_s1,
    pack_kernel_s1_from_offset,
    pack_kernel_s1_to_offset,
    pack_kernel_s2_packed_out,
    pack_kernel_s2_unpacked_out,
    pack_kernel_traced,
    pack_kernel_upsample,
    s2d,
)


# GN-statistics optimization barrier: OFF by default since round 3.  It
# was added as a mitigation for the round-2/3 packed NaN episode, whose
# actual root cause turned out to be the missing one-pass variance clamp
# (fixed in _GN).  Post-fix evidence for removal: trained-weight
# finiteness 12/12 on-chip calls (tools/barrier_ab.py) plus a clean full
# 200-file evaluation at exact quality parity, and the barrier costs
# ~9% RTF (46.1x -> 50.5x).  SDDM_STATS_BARRIER=1 restores it; the
# serving canary (Enhancer.validate) and bench warmup validation remain
# as independent backstops.
_STATS_BARRIER = __import__("os").environ.get(
    "SDDM_STATS_BARRIER", "0") != "0"

# Offset-phase res-block convolutions (round 3): the dense 3x3 packed
# kernels are only 1/4 nonzero, so the MXU does 4x the plain conv's FLOPs.
# Inside a res block the two 3x3 convs can instead hop to an OFFSET-packed
# grid and back with 2x2 kernels that are 9/16 nonzero — 2.25x fewer FLOPs
# for identical math (ops/packed.py::pack_kernel_s1_to_offset/_from_offset).
# Module-level so tools/A-B probes can flip it (SDDM_OFFSET_RB=0 selects the
# round-2 dense kernels); exactness is asserted either way in
# tests/test_packed_model.py.
import os as _os

_OFFSET_RB = _os.environ.get("SDDM_OFFSET_RB", "1") != "0"

from functools import lru_cache


@lru_cache(maxsize=None)
def _offset_mask_np(h_off: int, w_off: int, c: int):
    return offset_mask(h_off, w_off, c)


def _np(x):
    return np.asarray(x)


def _conv(x, w, b=None, strides=(1, 1), padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


# Tap-stacked head conv (round 3, A/B candidate): the final conv's packed
# kernel is [3, 3, 4C, 4] — a lane-DEGENERATE output (4 of 128 lanes), which
# XLA runs as a [Npix, 9·4C] x [9·4C, 4] matmul at ~3% MXU width utilization
# (~101 us of the 1612 us sampler step).  Restructure: one matmul with the
# 9 taps stacked on the OUTPUT axis ([Npix, 4C] x [4C, 9·4] — 9x wider N for
# the same FLOPs) followed by a 9-term shifted sum.  The matmul and the
# shifted sum both accumulate in f32 (preferred_element_type) with ONE
# final cast to x.dtype, matching _conv's single-rounding bf16 semantics —
# the round-3 forensics (see TestBf16NumericsParity history below) showed
# one extra bf16 rounding per site measurably degrades sampler quality.
# SDDM_TAPSTACK_HEAD=1 enables for the on-chip A/B.
_TAPSTACK_HEAD = _os.environ.get("SDDM_TAPSTACK_HEAD", "0") != "0"


def _conv_tapstack(x, w, b=None):
    """SAME-padding stride-1 cross-correlation with the spatial taps stacked
    on the matmul's output axis — for lane-degenerate out_channels.

    Odd kernel sizes only: symmetric pad (k//2, k//2) matches XLA SAME
    padding only when k is odd (XLA pads lo=(k-1)//2, hi=k//2)."""
    kh, kw, cin, cout = w.shape
    assert kh % 2 == 1 and kw % 2 == 1, "tapstack head requires odd kernels"
    # [kh,kw,cin,cout] -> [cin, kh*kw*cout]: contraction on cin only
    wm = jnp.transpose(w, (2, 0, 1, 3)).reshape(cin, kh * kw * cout)
    y = jnp.matmul(x, wm.astype(x.dtype),
                   preferred_element_type=jnp.float32)  # [B,H,W,kh*kw*cout]
    ph, pw = kh // 2, kw // 2
    yp = jnp.pad(y, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    B, H, W = x.shape[0], x.shape[1], x.shape[2]
    out = None
    for dy in range(kh):
        for dx in range(kw):
            t = dy * kw + dx
            sl = yp[:, dy:dy + H, dx:dx + W, t * cout:(t + 1) * cout]
            out = sl if out is None else out + sl
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def _sections_perm(sections: Tuple[int, ...]) -> np.ndarray:
    """Input-channel axis reorder folding packed-concat layout into a kernel:
    w_cat[:, :, perm_src, :] = w_packedcat.  (See ops/packed.pack_input_map:
    x_packedcat[..., j] == x_cat[..., map[j]].)"""
    from ..ops.packed import pack_input_map

    return pack_input_map(sections)


def _packed_gn_plan(groups: int, sections: Tuple[int, ...]):
    """Static plan for GroupNorm over a packed (possibly concatenated)
    tensor: (ch_orig, group_of, onehot, count)."""
    total = sum(sections)
    k = total // groups
    # channel order of concat(packed(s) for s in sections)
    ch_orig = []
    off = 0
    for c in sections:
        for _phase in range(4):
            ch_orig.extend(range(off, off + c))
        off += c
    ch_orig = np.asarray(ch_orig)
    group_of = ch_orig // k
    onehot = np.zeros((4 * total, groups), np.float32)
    onehot[np.arange(4 * total), group_of] = 1.0
    return ch_orig, group_of, onehot, 4 * k


class _GN:
    """GroupNorm plan for one call site (packed or plain).

    ``scale``/``bias`` must already be in the call site's channel order
    (packed order when a plan is given — the caller gathers by the plan's
    ``ch_orig``).  Registered as a jax pytree (arrays are leaves, the plan
    shape is static aux data) so packed param trees pass through jit/scan
    as arguments."""

    def __init__(self, scale, bias, groups: int, plan=None,
                 offset: bool = False):
        self.groups = groups
        self.eps = 1e-5
        # offset-packed input: the tensor carries one extra block per
        # spatial axis whose out-of-range plain rows/cols are ZERO (masked
        # by the caller), so sums are unaffected but the mean divisor must
        # be the true plain element count (h-1)(w-1)*count.
        self.offset = offset
        if offset and plan is None:
            raise ValueError("offset _GN requires a packed plan")
        if plan is None:
            self.onehot = None
            self.scale = scale
            self.bias = bias
            return
        _ch_orig, group_of, onehot, count = plan
        self.onehot = jnp.asarray(onehot)
        self.group_of = jnp.asarray(group_of)
        self.count = count  # packed channels per group per spatial position
        self.scale = scale
        self.bias = bias

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # optional barrier before the GN statistics (OFF by default — see
        # the _STATS_BARRIER note at module top: the NaN it mitigated was
        # root-caused to the missing variance clamp below, and the barrier
        # costs ~9% RTF)
        if _STATS_BARRIER:
            x = jax.lax.optimization_barrier(x)
        x32 = x.astype(jnp.float32)
        if self.onehot is None:
            b, h, w, c = x.shape
            g = self.groups
            r = x32.reshape(b, h, w, g, c // g)
            mean = jnp.mean(r, axis=(1, 2, 4), keepdims=True)
            # E[x²]−mean² cancels catastrophically when |mean|≫std (trained
            # activations reach this inside the sampler); clamp at 0 exactly
            # like flax's GroupNorm does, else rsqrt(negative+eps) = NaN
            var = jnp.maximum(
                0.0, jnp.mean(r * r, axis=(1, 2, 4), keepdims=True) - mean**2
            )
            y = (r - mean) * jax.lax.rsqrt(var + self.eps)
            y = y.reshape(b, h, w, c)
            return y * self.scale + self.bias
        b, h, w, _c = x.shape
        n = ((h - 1) * (w - 1) if self.offset else h * w) * self.count
        # per-channel spatial moments first (lane-aligned reductions), then
        # the group combine as a tiny [B, 4C] @ [4C, G] matmul.  Identical
        # math to one big einsum over (h, w, c); split because on this TPU
        # stack the full-tensor one-hot einsum miscompiles at flagship
        # shapes — finite input, NaN stats (artifacts/nan_repro/README.md)
        s1c = jnp.sum(x32, axis=(1, 2))
        s2c = jnp.sum(x32 * x32, axis=(1, 2))
        # HIGHEST precision: TPU's DEFAULT f32 matmul runs bf16-grade
        # passes, which puts ~1e-3 relative error on every group's
        # mean/var — a globally-structured perturbation that measurably
        # degraded 100-step sampler quality (PERFORMANCE.md round-3
        # quality forensics).  These are [B, 4C] @ [4C, G] — negligible.
        s1 = jnp.matmul(s1c, self.onehot,
                        precision=jax.lax.Precision.HIGHEST)
        s2 = jnp.matmul(s2c, self.onehot,
                        precision=jax.lax.Precision.HIGHEST)
        mean = s1 / n
        # same clamp as above (flax GroupNorm semantics): the one-pass
        # moment difference goes (tiny) negative under cancellation
        var = jnp.maximum(0.0, s2 / n - mean**2)
        mu = jnp.take(mean, self.group_of, axis=1)[:, None, None, :]
        iv = jnp.take(jax.lax.rsqrt(var + self.eps), self.group_of,
                      axis=1)[:, None, None, :]
        return (x32 - mu) * iv * self.scale + self.bias


def _gn_flatten(gn: "_GN"):
    children = (gn.scale, gn.bias, gn.onehot,
                getattr(gn, "group_of", None))
    aux = (gn.groups, gn.eps, getattr(gn, "count", None),
           getattr(gn, "offset", False))
    return children, aux


def _gn_unflatten(aux, children):
    gn = _GN.__new__(_GN)
    gn.scale, gn.bias, gn.onehot, group_of = children
    gn.groups, gn.eps, count, gn.offset = aux
    if group_of is not None:
        gn.group_of = group_of
    if count is not None:
        gn.count = count
    return gn


jax.tree_util.register_pytree_node(_GN, _gn_flatten, _gn_unflatten)


class _HostKit:
    """Numpy ops for one-time host-side packing (inference engine)."""

    get = staticmethod(_np)
    out = staticmethod(jnp.asarray)
    s1 = staticmethod(pack_kernel_s1)
    s1to = staticmethod(pack_kernel_s1_to_offset)
    s1from = staticmethod(pack_kernel_s1_from_offset)
    s2u = staticmethod(pack_kernel_s2_unpacked_out)
    s2p = staticmethod(pack_kernel_s2_packed_out)
    up = staticmethod(pack_kernel_upsample)

    @staticmethod
    def tile4(b):
        return np.tile(b, 4)

    @staticmethod
    def take(x, idx):
        return np.asarray(x)[idx]

    @staticmethod
    def unperm(w, perm):
        wcat = np.empty_like(w)
        wcat[:, :, perm, :] = w
        return wcat


class _TracedKit:
    """jnp ops for in-jit differentiable packing (training path).

    Kernel transforms use the probe-derived index maps
    (ops/packed.py::pack_kernel_traced), so gradients flow back from every
    packed copy of a weight to its original entry via the gather VJP."""

    get = staticmethod(jnp.asarray)
    out = staticmethod(lambda x: x)
    s1 = staticmethod(lambda w: pack_kernel_traced("s1", w))
    s1to = staticmethod(lambda w: pack_kernel_traced("s1to", w))
    s1from = staticmethod(lambda w: pack_kernel_traced("s1from", w))
    s2u = staticmethod(lambda w: pack_kernel_traced("s2u", w))
    s2p = staticmethod(lambda w: pack_kernel_traced("s2p", w))
    up = staticmethod(lambda w: pack_kernel_traced("up", w))

    @staticmethod
    def tile4(b):
        return jnp.tile(b, 4)

    @staticmethod
    def take(x, idx):
        return jnp.take(x, idx, axis=0)

    @staticmethod
    def unperm(w, perm):
        return jnp.take(w, np.argsort(perm), axis=2)


class _BlockKit(_TracedKit):
    """Gather-FREE in-jit packing: kernel transforms assembled from static
    slices + concatenations (ops/packed.py::pack_kernel_blocks), vector /
    channel reorders as exact one-hot contractions.  Zero gather/scatter
    ops in the packing graph — the round-4 A/B for the axon PJRT
    packed-training miscompute, whose suspected trigger is in-graph
    flat-index weight gathers reading donated buffers
    (artifacts/nan_repro/).  Select with SDDM_PACK_IMPL=blocks."""

    s1 = staticmethod(lambda w: pack_kernel_blocks("s1", w))
    s1to = staticmethod(lambda w: pack_kernel_blocks("s1to", w))
    s1from = staticmethod(lambda w: pack_kernel_blocks("s1from", w))
    s2u = staticmethod(lambda w: pack_kernel_blocks("s2u", w))
    s2p = staticmethod(lambda w: pack_kernel_blocks("s2p", w))
    up = staticmethod(lambda w: pack_kernel_blocks("up", w))

    @staticmethod
    def take(x, idx):
        return onehot_take(x, idx)

    @staticmethod
    def unperm(w, perm):
        return onehot_unperm_axis2(w, perm)


def select_traced_kit():
    """The SDDM_PACK_IMPL-selected kit for differentiable (training)
    packing, shared by the plain and variable-noise packed twins."""
    impl = _os.environ.get("SDDM_PACK_IMPL", "blocks")
    if impl not in ("gather", "blocks"):
        raise ValueError(f"SDDM_PACK_IMPL must be gather|blocks: {impl}")
    return _BlockKit if impl == "blocks" else _TracedKit


class PackedUNetModified2:
    """Drop-in inference twin of a :class:`UNetModified2` instance.

    ``packed_levels``: how many of the shallowest encoder/decoder levels run
    in the packed representation (0 = plain functional re-execution,
    len(channel_mults) = everything packed).
    """

    def __init__(self, net, packed_levels: int = None):
        if net.dropout:
            raise ValueError("packed engine is inference-only (dropout=0)")
        self.net = net
        self.num_levels = len(net.channel_mults)
        self.packed_levels = (
            self.num_levels if packed_levels is None else packed_levels
        )

    # -- parameter packing ----------------------------------------------------
    # ``pack``        — host-side, once, for the static inference engine.
    # ``pack_traced`` — identical math under jit on traced weights, so the
    #                   packed forward is differentiable wrt the ORIGINAL
    #                   param tree (training path).  Both run the same
    #                   traversal parameterized by an op kit; the traced
    #                   kernel transforms are probe-derived from the host
    #                   ones (ops/packed.py::pack_kernel_traced) so the two
    #                   can never drift.
    def pack(self, params) -> Dict:
        """Transform a trained UNetModified2 param tree into the packed
        engine's weight set (one host-side pass; kernels re-expressed via
        ops/packed.py, GN plans precomputed)."""
        return self._pack_with(_HostKit, params)

    def pack_traced(self, params) -> Dict:
        """Differentiable packing for the training path (runs under jit).

        SDDM_PACK_IMPL selects the implementation: "blocks" (default —
        gather-free slice+concat, see _BlockKit) or "gather" (jnp.take
        index maps).  Round-5 on-chip timing made blocks the default:
        15.9 ms/step at flagship scale vs 815 ms for gather (the
        flat-index weight gathers serialize on this runtime) vs 28.7 ms
        for the plain engine; both impls are gradient-exact
        (tests/test_packed_train.py)."""
        return self._pack_with(select_traced_kit(), params)

    def _pack_with(self, kit, params) -> Dict:
        p = params["params"] if "params" in params else params
        net = self.net
        ic = net.inner_channel
        packed: Dict[str, Any] = {"NoiseLevelMLP_0": jax.tree_util.tree_map(
            kit.out, p["NoiseLevelMLP_0"]
        )}
        lp = lambda level: level < self.packed_levels  # noqa: E731

        def s1_cat(w, sections):
            wp = kit.s1(w)
            if len(sections) > 1:
                wp = kit.unperm(wp, _sections_perm(sections))
            return wp

        def make_gn(gnsrc, sections, is_packed, offset=False):
            sc, bi = kit.get(gnsrc["scale"]), kit.get(gnsrc["bias"])
            if is_packed:
                plan = _packed_gn_plan(net.norm_groups, sections)
                return _GN(kit.out(kit.take(sc, plan[0])),
                           kit.out(kit.take(bi, plan[0])),
                           net.norm_groups, plan, offset=offset)
            return _GN(kit.out(sc), kit.out(bi), net.norm_groups)

        def conv1(src, kind, packed_in, packed_out):
            w, b = kit.get(src["kernel"]), kit.get(src["bias"])
            if kind == "s1":
                if packed_in:
                    w, b = kit.s1(w), kit.tile4(b)
            elif kind == "down":
                if packed_in and packed_out:
                    # NOTE: the 3x3 packed->packed kernel is only 1/4
                    # nonzero (4x the plain conv's MACs), but the
                    # alternative — the 9/16-dense 2x2 unpacked-out form +
                    # an in-graph space-to-depth repack — measured SLOWER
                    # on chip (50.7x -> 47.9x sampler RTF): the relayout
                    # transposes cost more than the redundant MACs, which
                    # ride the otherwise-underutilized MXU.
                    w, b = kit.s2p(w), kit.tile4(b)
                elif packed_in:
                    w = kit.s2u(w)
                elif packed_out:
                    raise NotImplementedError("unpacked->packed downsample")
            elif kind == "up":
                if packed_out:
                    w, b = kit.up(w), kit.tile4(b)
            return {"kernel": kit.out(w), "bias": kit.out(b)}

        def rb(src, sections, is_packed, cout):
            e: Dict[str, Any] = {}
            cin = sum(sections)
            offset = is_packed and _OFFSET_RB
            # Block_0 (input may be a packed concat); in offset mode its
            # conv hops to the OFFSET-packed grid and Block_1's conv hops
            # back — 2x2 kernels, 2.25x fewer FLOPs, same math.
            w, b = kit.get(src["Block_0"]["Conv_0"]["kernel"]), kit.get(
                src["Block_0"]["Conv_0"]["bias"])
            if offset:
                w = kit.s1to(w)
                if len(sections) > 1:
                    w = kit.unperm(w, _sections_perm(sections))
                b = kit.tile4(b)
            elif is_packed:
                w, b = s1_cat(w, sections), kit.tile4(b)
            e["Block_0"] = {
                "gn": make_gn(src["Block_0"]["GroupNorm_0"], sections,
                              is_packed),
                "conv": {"kernel": kit.out(w), "bias": kit.out(b)},
            }
            w, b = kit.get(src["Block_1"]["Conv_0"]["kernel"]), kit.get(
                src["Block_1"]["Conv_0"]["bias"])
            if offset:
                w, b = kit.s1from(w), kit.tile4(b)
            elif is_packed:
                w, b = kit.s1(w), kit.tile4(b)
            e["Block_1"] = {
                "gn": make_gn(src["Block_1"]["GroupNorm_0"], (cout,),
                              is_packed, offset=offset),
                "conv": {"kernel": kit.out(w), "bias": kit.out(b)},
            }
            fwa = src["FeatureWiseAffine_0"]["Dense_0"]
            e["fwa"] = {"kernel": kit.out(kit.get(fwa["kernel"])),
                        "bias": kit.out(kit.get(fwa["bias"]))}
            if cin != cout:
                w, b = kit.get(src["Conv_0"]["kernel"]), kit.get(
                    src["Conv_0"]["bias"])
                if is_packed:
                    w, b = s1_cat(w, sections), kit.tile4(b)
                e["res"] = {"kernel": kit.out(w), "bias": kit.out(b)}
            return e

        rb_i = ds_i = us_i = 0
        packed["Conv_0"] = conv1(p["Conv_0"], "s1", lp(0), lp(0))
        skips: List[Tuple[int, bool]] = [(ic, lp(0))]
        n_in = ic
        for lvl, mult in enumerate(net.channel_mults):
            n_out = ic * mult
            for _ in range(net.res_blocks):
                packed[f"ResnetBlock_{rb_i}"] = rb(
                    p[f"ResnetBlock_{rb_i}"], (n_in,), lp(lvl), n_out)
                skips.append((n_out, lp(lvl)))
                n_in = n_out
                rb_i += 1
            packed[f"Downsample_{ds_i}"] = conv1(
                p[f"Downsample_{ds_i}"]["Conv_0"], "down", lp(lvl),
                lp(lvl + 1))
            skips.append((n_out, lp(lvl + 1)))
            ds_i += 1

        packed[f"ResnetBlock_{rb_i}"] = rb(
            p[f"ResnetBlock_{rb_i}"], (n_in,), lp(self.num_levels), n_in)
        rb_i += 1

        h_c = n_in
        for ind in reversed(range(self.num_levels)):
            n_ch = ic * net.channel_mults[ind]
            skip_c, _sp = skips.pop()
            packed[f"ResnetBlock_{rb_i}"] = rb(
                p[f"ResnetBlock_{rb_i}"], (h_c, skip_c), lp(ind + 1), n_ch)
            h_c = n_ch
            rb_i += 1
            packed[f"Upsample_{us_i}"] = conv1(
                p[f"Upsample_{us_i}"]["Conv_0"], "up", lp(ind + 1), lp(ind))
            us_i += 1
            n_out = ic if ind == 0 else ic * net.channel_mults[ind - 1]
            for _ in range(net.res_blocks):
                skip_c, _sp = skips.pop()
                packed[f"ResnetBlock_{rb_i}"] = rb(
                    p[f"ResnetBlock_{rb_i}"], (h_c, skip_c), lp(ind), n_out)
                h_c = n_out
                rb_i += 1

        # final Block
        w, b = kit.get(p["Block_0"]["Conv_0"]["kernel"]), kit.get(
            p["Block_0"]["Conv_0"]["bias"])
        gn = make_gn(p["Block_0"]["GroupNorm_0"], (h_c,), lp(0))
        if lp(0):
            w, b = kit.s1(w), kit.tile4(b)
        packed["Block_0"] = {"gn": gn,
                             "conv": {"kernel": kit.out(w),
                                      "bias": kit.out(b)}}
        return packed

    # -- forward -------------------------------------------------------------
    def init(self, key, *args, **kw):
        raise TypeError("PackedUNetModified2 has no init; pack() a trained "
                        "UNetModified2 param tree instead")

    def apply(self, packed_params, condition, x_t, noise_level,
              deterministic: bool = True, rngs=None):
        from ..ops.packed import d2s  # local to keep module header light

        net = self.net
        pp = packed_params
        in_dtype = x_t.dtype
        lp = lambda level: level < self.packed_levels  # noqa: E731

        cond_f = frame_signal(condition[:, 0, :], net.segment_len,
                              net.segment_stride)
        xt_f = frame_signal(x_t[:, 0, :], net.segment_len, net.segment_stride)
        h = jnp.stack([cond_f, xt_f], axis=-1).astype(net.dtype)
        if lp(0):
            h = s2d(h)

        # noise MLP (PositionalEncoding + 2 dense + swish, blocks.py)
        nl = noise_level.astype(net.dtype)
        half = net.inner_channel // 2
        step = np.arange(half, dtype=np.float32)
        vec = jnp.asarray(1e4 * 10.0 ** (-step * 4.0 / half), nl.dtype)
        enc = nl.reshape(-1, 1) * vec[None, :]
        t = jnp.concatenate([jnp.sin(enc), jnp.cos(enc)], axis=-1)
        mlp = pp["NoiseLevelMLP_0"]
        t = t @ mlp["Dense_0"]["kernel"].astype(t.dtype) + \
            mlp["Dense_0"]["bias"].astype(t.dtype)
        t = jax.nn.silu(t)
        t = t @ mlp["Dense_1"]["kernel"].astype(t.dtype) + \
            mlp["Dense_1"]["bias"].astype(t.dtype)
        t_emb = jax.nn.silu(t)

        def run_rb(e, x, tile):
            # offset mode: Block_0's conv produces the OFFSET-packed grid
            # (2x2 kernel, one extra block per spatial axis), Block_1's conv
            # consumes it back to the standard grid — detected statically
            # from the packed kernel's spatial shape.
            offset = e["Block_0"]["conv"]["kernel"].shape[0] == 2
            blk = e["Block_0"]
            # keep the GN output in f32 THROUGH the swish, casting once at
            # the conv input — mirrors flax's promotion semantics.  The
            # round-3 cast-then-silu order added one extra bf16 rounding
            # (eps ~ 4e-3) per GN site, which measurably knocked sampler
            # trajectories into worse basins on bistable chunks
            # (PERFORMANCE.md round-3 quality forensics).
            y = jax.nn.silu(blk["gn"](x)).astype(x.dtype)
            y = _conv(y, blk["conv"]["kernel"], blk["conv"]["bias"],
                      padding=((1, 1), (1, 1)) if offset else "SAME")
            fwa = t_emb @ e["fwa"]["kernel"].astype(t_emb.dtype) + \
                e["fwa"]["bias"].astype(t_emb.dtype)
            # packed blocks need the per-channel bias tiled over the 4
            # phases; detect from static kernel shapes (jit-safe)
            if e["Block_1"]["conv"]["kernel"].shape[2] == 4 * fwa.shape[1]:
                fwa = jnp.tile(fwa, (1, 4))
            y = y + fwa[:, None, None, :]
            blk = e["Block_1"]
            if offset:
                # zero the out-of-range plain rows/cols: once so the GN
                # statistics see zeros there, and again after the affine +
                # silu so the VALID conv reads the plain SAME-padding zeros
                mask = jnp.asarray(
                    _offset_mask_np(y.shape[1], y.shape[2],
                                    y.shape[3] // 4), y.dtype)
                y = y * mask
                y2 = (jax.nn.silu(blk["gn"](y)) * mask).astype(y.dtype)
                y2 = _conv(y2, blk["conv"]["kernel"], blk["conv"]["bias"],
                           padding=((0, 0), (0, 0)))
            else:
                y2 = jax.nn.silu(blk["gn"](y)).astype(y.dtype)
                y2 = _conv(y2, blk["conv"]["kernel"], blk["conv"]["bias"])
            if "res" in e:
                x = _conv(x, e["res"]["kernel"], e["res"]["bias"])
            return y2 + x

        rb_i = ds_i = us_i = 0
        h = _conv(h, pp["Conv_0"]["kernel"], pp["Conv_0"]["bias"])
        feats = [h]
        for lvl, _mult in enumerate(net.channel_mults):
            for _ in range(net.res_blocks):
                h = run_rb(pp[f"ResnetBlock_{rb_i}"], h, lp(lvl))
                feats.append(h)
                rb_i += 1
            e = pp[f"Downsample_{ds_i}"]
            if lp(lvl) and lp(lvl + 1):
                h = _conv(h, e["kernel"], e["bias"], strides=(2, 2),
                          padding=((1, 1), (1, 1)))
            elif lp(lvl):
                h = _conv(h, e["kernel"], e["bias"],
                          padding=((1, 0), (1, 0)))
            else:
                h = _conv(h, e["kernel"], e["bias"], strides=(2, 2),
                          padding=((1, 1), (1, 1)))
            feats.append(h)
            ds_i += 1

        h = run_rb(pp[f"ResnetBlock_{rb_i}"], h, lp(self.num_levels))
        rb_i += 1

        for ind in reversed(range(self.num_levels)):
            h = run_rb(pp[f"ResnetBlock_{rb_i}"],
                       jnp.concatenate([h, feats.pop()], axis=-1),
                       lp(ind + 1))
            rb_i += 1
            e = pp[f"Upsample_{us_i}"]
            if lp(ind):
                if lp(ind + 1):
                    h = d2s(h)
                h = _conv(h, e["kernel"], e["bias"])
            else:
                b_, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b_, hh * 2, ww * 2, cc), "nearest")
                h = _conv(h, e["kernel"], e["bias"])
            us_i += 1
            for _ in range(net.res_blocks):
                h = run_rb(pp[f"ResnetBlock_{rb_i}"],
                           jnp.concatenate([h, feats.pop()], axis=-1),
                           lp(ind))
                rb_i += 1

        e = pp["Block_0"]
        out = jax.nn.silu(e["gn"](h)).astype(h.dtype)
        head = _conv_tapstack if _TAPSTACK_HEAD else _conv
        out = head(out, e["conv"]["kernel"], e["conv"]["bias"])
        if lp(0):
            out = d2s(out)
        out = jnp.moveaxis(out, -1, 1).astype(in_dtype)
        return overlap_add(out, net.num_samples, net.segment_stride)


class PackedTrainUNetModified2(PackedUNetModified2):
    """TRAINING twin: the packed forward differentiated wrt the ORIGINAL
    UNetModified2 param tree.

    ``init`` delegates to the flax module (checkpoints stay fully
    compatible); ``prepare`` re-packs the weights in-graph once per step
    (``pack_traced``, pure gathers — negligible next to the conv FLOPs),
    and autodiff accumulates each original weight's gradient from all of
    its packed copies through the gather VJPs.  SDDM calls ``prepare``
    once at its ``forward``/``infer`` entry, OUTSIDE the sampling scan, so
    inference re-packs once per call, not per diffusion step.

    Dropout must be 0 (as in the flagship recipe): the packed layout
    interleaves channels, so flax's per-channel dropout masks would not
    correspond.
    """

    def init(self, key, *args, **kw):
        return self.net.init(key, *args, **kw)

    def prepare(self, params):
        return self.pack_traced(params)

    def apply(self, packed_params, condition, x_t, noise_level,
              deterministic: bool = True, rngs=None):
        return PackedUNetModified2.apply(
            self, packed_params, condition, x_t, noise_level,
            deterministic=deterministic, rngs=rngs,
        )
