"""UNetTST — UNetModified2 encoder/decoder with a dual-transformer bottleneck.

Parity: reference model/UNetTST.py:270-392 — same framing/encoder/decoder
shape as UNetModified2 but the mid block is ``Dual_Transformer`` with
``n_TSTB`` layers; noise MLP has no final Swish.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.framing import frame_signal, overlap_add
from .blocks import (
    Block,
    Downsample,
    PositionalEncoding,
    ResnetBlock,
    Upsample,
    swish,
)
from .tst_blocks import DualTransformer


class UNetTST(nn.Module):
    num_samples: int
    in_channel: int = 2
    out_channel: int = 1
    inner_channel: int = 32
    norm_groups: int = 32
    channel_mults: Sequence[int] = (1, 2, 3, 4, 5)
    n_TSTB: int = 6
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

        t = PositionalEncoding(self.inner_channel)(noise_level.astype(self.dtype))
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

        # UNetTST's Dual_Transformer output Sequential is Conv THEN a
        # shared-slope PReLU (UNetTST.py:207-210) — unlike TSTNN's
        # PReLU-then-Conv and CAUNet's per-channel variant
        h = DualTransformer(h.shape[-1], h.shape[-1],
                            num_layers=self.n_TSTB,
                            output_conv_first=True)(h, deterministic)

        num_mults = len(self.channel_mults)
        for ind in reversed(range(num_mults)):
            n_ch = self.inner_channel * self.channel_mults[ind]
            h = ResnetBlock(n_ch, dropout=self.dropout,
                            norm_groups=self.norm_groups)(
                jnp.concatenate([h, feats.pop()], axis=-1), t, deterministic
            )
            h = Upsample(n_ch)(h)
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
