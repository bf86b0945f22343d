"""UNetModified2 — the flagship denoiser (PESQ 2.56 recipe).

Parity: reference model/UNetModified2.py:146-269.  A 5-level encoder/decoder
over framed waveforms: the ``[B, 1, T]`` signal is framed into
``[n_frames=256, frame_len=128]`` windows (stride 64), condition and noisy
sample stacked as 2 input channels, noise level injected per ResnetBlock via
FeatureWiseAffine, skip connections concatenated in the decoder, and the
output overlap-added back to a waveform.

TPU-first: NHWC layout ``[B, N, F, C]``; framing/overlap-add are the
reshape-based gather-free ops from ``sddm_tpu.ops.framing``; compute dtype is
configurable (bf16 feeds the MXU at 2x).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.framing import frame_signal, overlap_add
from .blocks import (Block, Downsample, NoiseLevelMLP, ResnetBlock, Upsample,
                     torch_conv)


class UNetModified2(nn.Module):
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
    # GroupNorm normalize/affine compute dtype; None inherits ``dtype``
    # (stats are always f32 — see blocks.Block.norm_dtype).
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        condition: jnp.ndarray,
        x_t: jnp.ndarray,
        noise_level: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """condition/x_t: [B, 1, T] waveforms; noise_level: [B, 1, 1] (or any
        shape flattening to [B]).  Returns predicted noise [B, 1, T].
        Mirrors reference forward (model/UNetModified2.py:237-269)."""
        in_dtype = x_t.dtype
        cond_f = frame_signal(
            condition[:, 0, :], self.segment_len, self.segment_stride
        )
        xt_f = frame_signal(x_t[:, 0, :], self.segment_len, self.segment_stride)
        h = jnp.stack([cond_f, xt_f], axis=-1).astype(self.dtype)  # [B,N,F,2]

        t_emb = NoiseLevelMLP(self.inner_channel)(
            noise_level.astype(self.dtype)
        )  # [B, inner_channel]

        feats = []
        h = torch_conv(self.in_channel, self.inner_channel, (3, 3),
                       padding="SAME", dtype=self.dtype)(h)
        feats.append(h)
        for mult in self.channel_mults:
            n_out = self.inner_channel * mult
            for _ in range(self.res_blocks):
                h = ResnetBlock(
                    n_out, dropout=self.dropout, norm_groups=self.norm_groups,
                    norm_dtype=self.norm_dtype,
                )(h, t_emb, deterministic)
                feats.append(h)
            h = Downsample(n_out)(h)
            feats.append(h)

        h = ResnetBlock(
            h.shape[-1], dropout=self.dropout, norm_groups=self.norm_groups,
            norm_dtype=self.norm_dtype,
        )(h, t_emb, deterministic)

        num_mults = len(self.channel_mults)
        for ind in reversed(range(num_mults)):
            n_ch = self.inner_channel * self.channel_mults[ind]
            h = ResnetBlock(
                n_ch, dropout=self.dropout, norm_groups=self.norm_groups,
                norm_dtype=self.norm_dtype,
            )(jnp.concatenate([h, feats.pop()], axis=-1), t_emb, deterministic)
            h = Upsample(n_ch)(h)
            n_out = (
                self.inner_channel
                if ind == 0
                else self.inner_channel * self.channel_mults[ind - 1]
            )
            for _ in range(self.res_blocks):
                h = ResnetBlock(
                    n_out, dropout=self.dropout, norm_groups=self.norm_groups,
                    norm_dtype=self.norm_dtype,
                )(jnp.concatenate([h, feats.pop()], axis=-1), t_emb, deterministic)

        out = Block(self.out_channel, groups=self.norm_groups,
                    norm_dtype=self.norm_dtype)(h, deterministic)
        # [B, N, F, 1] -> [B, 1, N, F] -> overlap-add -> [B, 1, T]
        out = jnp.moveaxis(out, -1, 1).astype(in_dtype)
        return overlap_add(out, self.num_samples, self.segment_stride)
