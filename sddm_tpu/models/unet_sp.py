"""UNetSP — UNetModified2 variant with sub-pixel (PixelShuffle) upsampling.

Parity: reference model/UNet_SubpixelConv.py:139-267 — WaveGrad-style
positional encoding (:44-57), noise MLP without final Swish, and a decoder
whose first ResnetBlock per level emits 4x channels consumed by
``PixelShuffle(2)`` (:89-96, :211-217).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.framing import frame_signal, overlap_add
from .blocks import Block, Downsample, ResnetBlock, swish
import numpy as np
import math


class WaveGradPE(nn.Module):
    """exp(-ln(1e4) * step)-style encoding of sqrt_alpha_bar
    (reference UNet_SubpixelConv.py:44-57)."""

    dim: int

    @nn.compact
    def __call__(self, noise_level: jnp.ndarray) -> jnp.ndarray:
        count = self.dim // 2
        step = np.arange(count, dtype=np.float32) / count
        vector = jnp.asarray(np.exp(-math.log(1e4) * step), noise_level.dtype)
        x = noise_level.reshape(-1, 1) * vector[None, :]
        return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)


def pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """torch PixelShuffle on NHWC: [B, H, W, C*r*r] -> [B, H*r, W*r, C] with
    channel index ch = c*r*r + i*r + j."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # b, h, i, w, j, c
    return x.reshape(b, h * r, w * r, c)


class UNetSP(nn.Module):
    num_samples: int
    in_channel: int = 2
    out_channel: int = 1
    inner_channel: int = 32
    norm_groups: int = 32
    channel_mults: Sequence[int] = (1, 2, 3, 4, 5)
    res_blocks: int = 3
    dropout: float = 0.0
    segment_len: int = 128
    segment_stride: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, condition, x_t, noise_level, deterministic=True):
        in_dtype = x_t.dtype
        cond_f = frame_signal(
            condition[:, 0, :], self.segment_len, self.segment_stride
        )
        xt_f = frame_signal(x_t[:, 0, :], self.segment_len, self.segment_stride)
        h = jnp.stack([cond_f, xt_f], axis=-1).astype(self.dtype)

        t = WaveGradPE(self.inner_channel)(noise_level.astype(self.dtype))
        t = nn.Dense(self.inner_channel * 4, dtype=self.dtype)(t)
        t = swish(t)
        t = nn.Dense(self.inner_channel, dtype=self.dtype)(t)  # no final Swish

        feats = []
        h = nn.Conv(self.inner_channel, (3, 3), padding="SAME",
                    dtype=self.dtype)(h)
        feats.append(h)
        for mult in self.channel_mults:
            n_out = self.inner_channel * mult
            for _ in range(self.res_blocks):
                h = ResnetBlock(n_out, dropout=self.dropout,
                                norm_groups=self.norm_groups)(h, t, deterministic)
                feats.append(h)
            h = Downsample(n_out)(h)
            feats.append(h)

        h = ResnetBlock(h.shape[-1], dropout=self.dropout,
                        norm_groups=self.norm_groups)(h, t, deterministic)

        num_mults = len(self.channel_mults)
        for ind in reversed(range(num_mults)):
            n_ch = self.inner_channel * self.channel_mults[ind]
            # 4x channels for the sub-pixel shuffle
            h = ResnetBlock(n_ch * 4, dropout=self.dropout,
                            norm_groups=self.norm_groups)(
                jnp.concatenate([h, feats.pop()], axis=-1), t, deterministic
            )
            h = pixel_shuffle(h, 2)
            n_out = (
                self.inner_channel
                if ind == 0
                else self.inner_channel * self.channel_mults[ind - 1]
            )
            for _ in range(self.res_blocks):
                h = ResnetBlock(n_out, dropout=self.dropout,
                                norm_groups=self.norm_groups)(
                    jnp.concatenate([h, feats.pop()], axis=-1), t, deterministic
                )

        out = Block(self.out_channel, groups=self.norm_groups)(h, deterministic)
        out = jnp.moveaxis(out, -1, 1).astype(in_dtype)
        return overlap_add(out, self.num_samples, self.segment_stride)
