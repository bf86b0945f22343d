"""UNetModified2_VariableNoiseLevel — per-segment noise-level denoiser.

Parity: reference model/UNetModified2_withVariableNoiseLevel.py:114-242.
Operates on pre-segmented audio ``[B, 1, N, L]`` with a PER-SEGMENT noise
level ``[B, 1, N, 1]``: the noise level is positionally encoded across the
channel dim (1e7 frequency scale, :10-30), run through a 1x1-conv MLP, and a
parallel "noise-level pyramid" is down/上-sampled alongside the feature
pyramid (Downsample_NoiseLevel / Upsample_NoiseLevel, :43-75); each
ResnetBlock injects it via a 1x1 conv broadcast over the segment-length axis.

NHWC internally: features ``[B, N, L, C]``, noise embedding ``[B, N, 1, E]``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import Block, Downsample, Upsample, swish


class VariablePositionalEncoding(nn.Module):
    """Encode [B, 1, N, 1] noise level to [B, N, 1, dim] with the 1e7-scale
    frequency vector (reference :10-30)."""

    dim: int = 128

    @nn.compact
    def __call__(self, noise_level: jnp.ndarray) -> jnp.ndarray:
        half = self.dim // 2
        step = np.arange(half, dtype=np.float32)
        vector = jnp.asarray(1e7 * 10.0 ** (-step * 4.0 / half), noise_level.dtype)
        # [B, 1, N, 1] -> [B, N, 1, 1] * [half] -> [B, N, 1, half]
        nl = jnp.moveaxis(noise_level, 1, -1)
        enc = nl * vector
        return jnp.concatenate([jnp.sin(enc), jnp.cos(enc)], axis=-1)


class NoiseLevelConvMLP(nn.Module):
    """1x1-conv MLP over the encoded noise level (reference :133-139)."""

    channel: int = 128

    @nn.compact
    def __call__(self, noise_level: jnp.ndarray) -> jnp.ndarray:
        t = VariablePositionalEncoding(self.channel)(noise_level)
        t = nn.Conv(self.channel * 4, (1, 1), dtype=t.dtype)(t)
        t = swish(t)
        t = nn.Conv(self.channel, (1, 1), dtype=t.dtype)(t)
        return swish(t)


class DownsampleNoiseLevel(nn.Module):
    """(3,1) conv stride (2,1) + swish on the [B, N, 1, E] pyramid (:65-75)."""

    dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.dim, (3, 1), strides=(2, 1), padding=((1, 1), (0, 0)),
                    dtype=t.dtype)(t)
        return swish(h)


class UpsampleNoiseLevel(nn.Module):
    """nearest (2,1) upsample + (3,1) conv + swish (:43-54)."""

    dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        b, n, one, c = t.shape
        up = jax.image.resize(t, (b, n * 2, one, c), method="nearest")
        h = nn.Conv(self.dim, (3, 1), padding=((1, 1), (0, 0)), dtype=t.dtype)(up)
        return swish(h)


class VariableResnetBlock(nn.Module):
    """ResnetBlock with per-segment noise injection via 1x1 conv (:93-110)."""

    dim_out: int
    dropout: float = 0.0
    norm_groups: int = 32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, t: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        h = Block(self.dim_out, groups=self.norm_groups)(x, deterministic)
        # t: [B, N, 1, E] -> 1x1 conv -> [B, N, 1, dim_out], broadcast over L
        noise = nn.Conv(self.dim_out, (1, 1), dtype=t.dtype)(t)
        h = h + noise  # [B,N,1,C] broadcasts over the segment-length axis
        h = Block(self.dim_out, groups=self.norm_groups, dropout=self.dropout)(
            h, deterministic
        )
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=x.dtype)(x)
        return h + x


class UNetModified2_VariableNoiseLevel(nn.Module):
    in_channel: int = 2
    out_channel: int = 1
    inner_channel: int = 32
    norm_groups: int = 32
    channel_mults: Sequence[int] = (1, 2, 3, 4, 5)
    res_blocks: int = 3
    dropout: float = 0.0
    noise_level_channel: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        condition: jnp.ndarray,
        x_t: jnp.ndarray,
        noise_level: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """condition/x_t: [B, 1, N, L] segmented; noise_level: [B, 1, N, 1].
        Returns [B, 1, N, L] (reference forward :207-242)."""
        in_dtype = x_t.dtype
        # NCHW -> NHWC
        h = jnp.concatenate(
            [jnp.moveaxis(condition, 1, -1), jnp.moveaxis(x_t, 1, -1)], axis=-1
        ).astype(self.dtype)  # [B, N, L, 2]
        t = NoiseLevelConvMLP(self.noise_level_channel)(
            noise_level.astype(self.dtype)
        )  # [B, N, 1, E]

        h = nn.Conv(self.inner_channel, (3, 3), padding="SAME", dtype=self.dtype)(h)
        feats = [h]
        for mult in self.channel_mults:
            n_out = self.inner_channel * mult
            for _ in range(self.res_blocks):
                h = VariableResnetBlock(
                    n_out, dropout=self.dropout, norm_groups=self.norm_groups
                )(h, t, deterministic)
                feats.append(h)
            h = Downsample(n_out)(h)
            t = DownsampleNoiseLevel(self.noise_level_channel)(t)
            feats.append(h)

        h = VariableResnetBlock(
            h.shape[-1], dropout=self.dropout, norm_groups=self.norm_groups
        )(h, t, deterministic)

        num_mults = len(self.channel_mults)
        for ind in reversed(range(num_mults)):
            n_ch = self.inner_channel * self.channel_mults[ind]
            h = VariableResnetBlock(
                n_ch, dropout=self.dropout, norm_groups=self.norm_groups
            )(jnp.concatenate([h, feats.pop()], axis=-1), t, deterministic)
            h = Upsample(n_ch)(h)
            t = UpsampleNoiseLevel(self.noise_level_channel)(t)
            n_out = (
                self.inner_channel
                if ind == 0
                else self.inner_channel * self.channel_mults[ind - 1]
            )
            for _ in range(self.res_blocks):
                h = VariableResnetBlock(
                    n_out, dropout=self.dropout, norm_groups=self.norm_groups
                )(jnp.concatenate([h, feats.pop()], axis=-1), t, deterministic)

        out = Block(self.out_channel, groups=self.norm_groups)(h, deterministic)
        return jnp.moveaxis(out, -1, 1).astype(in_dtype)  # [B, 1, N, L]
