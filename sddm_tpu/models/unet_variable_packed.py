"""Packed (space-to-depth) engine for UNetModified2_VariableNoiseLevel.

Same layout transformation as models/unet_packed.py (the C=32 feature convs
of the SNR-adaptive denoiser waste 4x of the TPU lane axis exactly like the
flagship's): feature activations ``[B, N, L, C] -> [B, N/2, L/2, 4C]`` with
packed channel ``(2a+b)*C + c`` for frame parity ``a`` / position parity
``b``.  The noise-level pyramid ``[B, N, 1, E]`` stays UNPACKED — it is
tiny (one vector per segment) — and the per-segment injection
(reference model/UNetModified2_withVariableNoiseLevel.py:93-110: a 1x1 conv
of the pyramid added broadcast over the segment-length axis) maps into the
packed representation by frame-parity interleaving:

    packed(h + noise)[i, j, (2a+b)*C + c] = packed(h)[...] + noise[2i+a, c]

i.e. ``noise_packed = concat([n_even, n_even, n_odd, n_odd], axis=-1)``
with ``n_even/n_odd`` the even/odd segment rows of the 1x1-conv output.

Checkpoint-compatible: ``pack``/``pack_traced`` rearrange the trained
UNetModified2_VariableNoiseLevel param tree with the probe-derived kernel
transforms from ops/packed.py; exactness is asserted elementwise in
tests/test_variable_packed.py.  ``PackedTrainUNetVariable`` is the
differentiable twin (same contract as PackedTrainUNetModified2).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.packed import d2s, s2d
from . import unet_packed as _up
from .unet_packed import _GN, _HostKit, _TracedKit, _packed_gn_plan, _conv
from .unet_packed import select_traced_kit
from .unet_packed import _offset_mask_np, _sections_perm


def _inject_packed(noise_bn1c: jnp.ndarray) -> jnp.ndarray:
    """[B, N, 1, C] per-segment vectors -> [B, N/2, 1, 4C] packed-channel
    broadcast layout (phase (a, b) reads segment 2i+a; independent of b)."""
    n_even = noise_bn1c[:, 0::2]
    n_odd = noise_bn1c[:, 1::2]
    return jnp.concatenate([n_even, n_even, n_odd, n_odd], axis=-1)


def _inject_packed_offset(noise_bn1c: jnp.ndarray) -> jnp.ndarray:
    """[B, N, 1, C] -> [B, N/2 + 1, 1, 4C] for the OFFSET-packed grid:
    phase a at offset block i reads plain segment row 2i-1+a, so phase
    (0, b) carries the PREVIOUS odd row and phase (1, b) the even row;
    the two out-of-range rows get zeros (masked downstream regardless)."""
    n_even = noise_bn1c[:, 0::2]
    n_odd = noise_bn1c[:, 1::2]
    z = jnp.zeros_like(n_even[:, :1])
    n_prev_odd = jnp.concatenate([z, n_odd], axis=1)   # plain row 2i-1
    n_even_ext = jnp.concatenate([n_even, z], axis=1)  # plain row 2i
    return jnp.concatenate(
        [n_prev_odd, n_prev_odd, n_even_ext, n_even_ext], axis=-1)


class PackedUNetVariable:
    """Inference twin of a :class:`UNetModified2_VariableNoiseLevel`."""

    def __init__(self, net, packed_levels: int = None):
        if net.dropout:
            raise ValueError("packed engine is inference-only (dropout=0)")
        self.net = net
        self.num_levels = len(net.channel_mults)
        self.packed_levels = (
            self.num_levels if packed_levels is None else packed_levels
        )

    # -- parameter packing ----------------------------------------------------
    def pack(self, params) -> Dict:
        return self._pack_with(_HostKit, params)

    def pack_traced(self, params) -> Dict:
        return self._pack_with(select_traced_kit(), params)

    def _pack_with(self, kit, params) -> Dict:
        p = params["params"] if "params" in params else params
        net = self.net
        ic = net.inner_channel
        lp = lambda level: level < self.packed_levels  # noqa: E731

        # the noise-level pyramid runs unpacked: copy its params through
        packed: Dict[str, Any] = {}
        for name in p:
            if name.startswith(("NoiseLevelConvMLP", "DownsampleNoiseLevel",
                                "UpsampleNoiseLevel")):
                packed[name] = jax.tree_util.tree_map(
                    lambda x: kit.out(kit.get(x)), p[name]
                )

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

        def block(src, sections, is_packed, kind="s1", gn_offset=False):
            w, b = kit.get(src["Conv_0"]["kernel"]), kit.get(
                src["Conv_0"]["bias"])
            if is_packed:
                if kind == "s1to":
                    w = kit.s1to(w)
                    if len(sections) > 1:
                        w = kit.unperm(w, _sections_perm(sections))
                elif kind == "s1from":
                    assert len(sections) == 1
                    w = kit.s1from(w)
                else:
                    w = s1_cat(w, sections)
                b = kit.tile4(b)
            return {
                "gn": make_gn(src["GroupNorm_0"], sections, is_packed,
                              offset=gn_offset),
                "conv": {"kernel": kit.out(w), "bias": kit.out(b)},
            }

        def vrb(src, sections, is_packed, cout):
            # offset-phase res-block convs (see unet_packed._OFFSET_RB):
            # Block_0 hops to the offset grid, Block_1 hops back
            off = is_packed and _up._OFFSET_RB
            e: Dict[str, Any] = {
                "Block_0": block(src["Block_0"], sections, is_packed,
                                 kind="s1to" if off else "s1"),
                "Block_1": block(src["Block_1"], (cout,), is_packed,
                                 kind="s1from" if off else "s1",
                                 gn_offset=off),
                # per-segment noise 1x1 conv stays unpacked (applied to the
                # pyramid, then phase-interleaved at inject time)
                "noise": {
                    "kernel": kit.out(kit.get(src["Conv_0"]["kernel"])),
                    "bias": kit.out(kit.get(src["Conv_0"]["bias"])),
                },
            }
            if sum(sections) != cout:
                w, b = kit.get(src["Conv_1"]["kernel"]), kit.get(
                    src["Conv_1"]["bias"])
                if is_packed:
                    w, b = s1_cat(w, sections), kit.tile4(b)
                e["res"] = {"kernel": kit.out(w), "bias": kit.out(b)}
            return e

        def conv1(src, kind, packed_in, packed_out):
            w, b = kit.get(src["kernel"]), kit.get(src["bias"])
            if kind == "s1":
                if packed_in:
                    w, b = kit.s1(w), kit.tile4(b)
            elif kind == "down":
                if packed_in and packed_out:
                    w, b = kit.s2p(w), kit.tile4(b)
                elif packed_in:
                    w = kit.s2u(w)
                elif packed_out:
                    raise NotImplementedError("unpacked->packed downsample")
            elif kind == "up":
                if packed_out:
                    w, b = kit.up(w), kit.tile4(b)
            return {"kernel": kit.out(w), "bias": kit.out(b)}

        rb_i = ds_i = us_i = 0
        packed["Conv_0"] = conv1(p["Conv_0"], "s1", lp(0), lp(0))
        skips: List[Tuple[int, bool]] = [(ic, lp(0))]
        n_in = ic
        for lvl, mult in enumerate(net.channel_mults):
            n_out = ic * mult
            for _ in range(net.res_blocks):
                packed[f"VariableResnetBlock_{rb_i}"] = vrb(
                    p[f"VariableResnetBlock_{rb_i}"], (n_in,), lp(lvl), n_out)
                skips.append((n_out, lp(lvl)))
                n_in = n_out
                rb_i += 1
            packed[f"Downsample_{ds_i}"] = conv1(
                p[f"Downsample_{ds_i}"]["Conv_0"], "down", lp(lvl),
                lp(lvl + 1))
            skips.append((n_out, lp(lvl + 1)))
            ds_i += 1

        packed[f"VariableResnetBlock_{rb_i}"] = vrb(
            p[f"VariableResnetBlock_{rb_i}"], (n_in,), lp(self.num_levels),
            n_in)
        rb_i += 1

        h_c = n_in
        for ind in reversed(range(self.num_levels)):
            n_ch = ic * net.channel_mults[ind]
            skip_c, _sp = skips.pop()
            packed[f"VariableResnetBlock_{rb_i}"] = vrb(
                p[f"VariableResnetBlock_{rb_i}"], (h_c, skip_c), lp(ind + 1),
                n_ch)
            h_c = n_ch
            rb_i += 1
            packed[f"Upsample_{us_i}"] = conv1(
                p[f"Upsample_{us_i}"]["Conv_0"], "up", lp(ind + 1), lp(ind))
            us_i += 1
            n_out = ic if ind == 0 else ic * net.channel_mults[ind - 1]
            for _ in range(net.res_blocks):
                skip_c, _sp = skips.pop()
                packed[f"VariableResnetBlock_{rb_i}"] = vrb(
                    p[f"VariableResnetBlock_{rb_i}"], (h_c, skip_c), lp(ind),
                    n_out)
                h_c = n_out
                rb_i += 1

        packed["Block_0"] = block(p["Block_0"], (h_c,), lp(0))
        return packed

    # -- forward -------------------------------------------------------------
    def init(self, key, *args, **kw):
        raise TypeError("PackedUNetVariable has no init; pack() a trained "
                        "UNetModified2_VariableNoiseLevel param tree instead")

    def apply(self, packed_params, condition, x_t, noise_level,
              deterministic: bool = True, rngs=None):
        net = self.net
        pp = packed_params
        in_dtype = x_t.dtype
        lp = lambda level: level < self.packed_levels  # noqa: E731

        # [B, 1, N, L] -> [B, N, L, 2]
        h = jnp.concatenate(
            [jnp.moveaxis(condition, 1, -1), jnp.moveaxis(x_t, 1, -1)],
            axis=-1,
        ).astype(net.dtype)
        if lp(0):
            h = s2d(h)

        # noise pyramid (unpacked): VariablePositionalEncoding + conv MLP
        # (models/unet_variable.py:27-54)
        nl = noise_level.astype(net.dtype)
        half = net.noise_level_channel // 2
        step = np.arange(half, dtype=np.float32)
        vector = jnp.asarray(1e7 * 10.0 ** (-step * 4.0 / half), nl.dtype)
        t = jnp.moveaxis(nl, 1, -1) * vector  # [B, N, 1, half]
        t = jnp.concatenate([jnp.sin(t), jnp.cos(t)], axis=-1)
        mlp = pp["NoiseLevelConvMLP_0"]
        t = _conv(t, mlp["Conv_0"]["kernel"], mlp["Conv_0"]["bias"])
        t = jax.nn.silu(t)
        t = _conv(t, mlp["Conv_1"]["kernel"], mlp["Conv_1"]["bias"])
        t = jax.nn.silu(t)

        def run_vrb(e, x, t_lvl, is_packed):
            offset = e["Block_0"]["conv"]["kernel"].shape[0] == 2
            blk = e["Block_0"]
            # f32 through the swish, one cast at the conv input (see
            # unet_packed.run_rb — the extra bf16 rounding measurably
            # degraded sampler quality)
            y = jax.nn.silu(blk["gn"](x)).astype(x.dtype)
            y = _conv(y, blk["conv"]["kernel"], blk["conv"]["bias"],
                      padding=((1, 1), (1, 1)) if offset else "SAME")
            noise = _conv(t_lvl, e["noise"]["kernel"], e["noise"]["bias"])
            if offset:
                y = y + _inject_packed_offset(noise)
            elif is_packed:
                y = y + _inject_packed(noise)
            else:
                y = y + noise  # [B, N, 1, C] broadcasts over L
            blk = e["Block_1"]
            if offset:
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

        def run_noise_down(src, t_lvl):
            h_ = _conv(t_lvl, src["Conv_0"]["kernel"], src["Conv_0"]["bias"],
                       strides=(2, 1), padding=((1, 1), (0, 0)))
            return jax.nn.silu(h_)

        def run_noise_up(src, t_lvl):
            b_, n_, one, c_ = t_lvl.shape
            up = jax.image.resize(t_lvl, (b_, n_ * 2, one, c_), "nearest")
            h_ = _conv(up, src["Conv_0"]["kernel"], src["Conv_0"]["bias"],
                       padding=((1, 1), (0, 0)))
            return jax.nn.silu(h_)

        rb_i = ds_i = us_i = 0
        h = _conv(h, pp["Conv_0"]["kernel"], pp["Conv_0"]["bias"])
        feats = [h]
        for lvl, _mult in enumerate(net.channel_mults):
            for _ in range(net.res_blocks):
                h = run_vrb(pp[f"VariableResnetBlock_{rb_i}"], h, t, lp(lvl))
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
            t = run_noise_down(pp[f"DownsampleNoiseLevel_{ds_i - 1}"], t)

        h = run_vrb(pp[f"VariableResnetBlock_{rb_i}"], h, t,
                    lp(self.num_levels))
        rb_i += 1

        for ind in reversed(range(self.num_levels)):
            h = run_vrb(pp[f"VariableResnetBlock_{rb_i}"],
                        jnp.concatenate([h, feats.pop()], axis=-1), t,
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
            t = run_noise_up(pp[f"UpsampleNoiseLevel_{us_i}"], t)
            us_i += 1
            for _ in range(net.res_blocks):
                h = run_vrb(pp[f"VariableResnetBlock_{rb_i}"],
                            jnp.concatenate([h, feats.pop()], axis=-1), t,
                            lp(ind))
                rb_i += 1

        e = pp["Block_0"]
        out = jax.nn.silu(e["gn"](h)).astype(h.dtype)
        out = _conv(out, e["conv"]["kernel"], e["conv"]["bias"])
        if lp(0):
            out = d2s(out)
        return jnp.moveaxis(out, -1, 1).astype(in_dtype)


class PackedTrainUNetVariable(PackedUNetVariable):
    """Differentiable twin — trains the ORIGINAL param tree through the
    packed forward (same contract as PackedTrainUNetModified2)."""

    def init(self, key, *args, **kw):
        return self.net.init(key, *args, **kw)

    def prepare(self, params):
        return self.pack_traced(params)

    def apply(self, packed_params, condition, x_t, noise_level,
              deterministic: bool = True, rngs=None):
        return PackedUNetVariable.apply(
            self, packed_params, condition, x_t, noise_level,
            deterministic=deterministic, rngs=rngs,
        )
