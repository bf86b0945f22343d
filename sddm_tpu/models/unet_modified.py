"""UNetModified — SR3-style UNet with self-attention.

Parity: reference model/UNetModified.py:186-323.  Differences from
UNetModified2: channel_mults default (1,2,4,8,8); self-attention at the
levels listed in ``attn_layer`` and at the first mid block; NO downsample
after the last level; decoder runs ``res_blocks+1`` blocks per level and
upsamples only between levels; noise MLP has no final Swish.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.framing import frame_signal, overlap_add
from .blocks import (
    Block,
    Downsample,
    ResnetBlocWithAttn,
    Upsample,
    swish,
)
from .unet_sp import WaveGradPE


class UNetModified(nn.Module):
    num_samples: int
    in_channel: int = 2
    out_channel: int = 1
    inner_channel: int = 32
    norm_groups: int = 32
    channel_mults: Sequence[int] = (1, 2, 4, 8, 8)
    attn_layer: Sequence[int] = (4,)
    res_blocks: int = 3
    dropout: float = 0.0
    segment_len: int = 128
    segment_stride: int = 64
    with_noise_level_emb: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        condition: jnp.ndarray,
        x_t: jnp.ndarray,
        noise_level: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        in_dtype = x_t.dtype
        cond_f = frame_signal(
            condition[:, 0, :], self.segment_len, self.segment_stride
        )
        xt_f = frame_signal(x_t[:, 0, :], self.segment_len, self.segment_stride)
        h = jnp.stack([cond_f, xt_f], axis=-1).astype(self.dtype)

        if self.with_noise_level_emb:
            # WaveGrad-style PE (exp(-ln(1e4)*step), UNetModified.py:45-59
            # — NOT UNetModified2's 1e4*10**(-4s/half) encoding) -> Dense(4x)
            # -> Swish -> Dense(1x), no trailing Swish (:205-211)
            t = WaveGradPE(self.inner_channel)(
                noise_level.astype(self.dtype)
            )
            t = nn.Dense(self.inner_channel * 4, dtype=self.dtype)(t)
            t = swish(t)
            t = nn.Dense(self.inner_channel, dtype=self.dtype)(t)
        else:
            t = jnp.zeros((h.shape[0], self.inner_channel), self.dtype)

        num_mults = len(self.channel_mults)
        feats = []
        h = nn.Conv(self.inner_channel, (3, 3), padding="SAME", dtype=self.dtype)(h)
        feats.append(h)
        for ind, mult in enumerate(self.channel_mults):
            use_attn = ind in self.attn_layer
            n_out = self.inner_channel * mult
            for _ in range(self.res_blocks):
                h = ResnetBlocWithAttn(
                    n_out, norm_groups=self.norm_groups, dropout=self.dropout,
                    with_attn=use_attn,
                )(h, t, deterministic)
                feats.append(h)
            if ind != num_mults - 1:
                h = Downsample(n_out)(h)
                feats.append(h)

        h = ResnetBlocWithAttn(
            h.shape[-1], norm_groups=self.norm_groups, dropout=self.dropout,
            with_attn=True,
        )(h, t, deterministic)
        h = ResnetBlocWithAttn(
            h.shape[-1], norm_groups=self.norm_groups, dropout=self.dropout,
            with_attn=False,
        )(h, t, deterministic)

        for ind in reversed(range(num_mults)):
            use_attn = ind in self.attn_layer
            n_out = self.inner_channel * self.channel_mults[ind]
            for _ in range(self.res_blocks + 1):
                h = ResnetBlocWithAttn(
                    n_out, norm_groups=self.norm_groups, dropout=self.dropout,
                    with_attn=use_attn,
                )(jnp.concatenate([h, feats.pop()], axis=-1), t, deterministic)
            if ind >= 1:
                h = Upsample(n_out)(h)

        out = Block(self.out_channel, groups=self.norm_groups)(h, deterministic)
        out = jnp.moveaxis(out, -1, 1).astype(in_dtype)
        return overlap_add(out, self.num_samples, self.segment_stride)
