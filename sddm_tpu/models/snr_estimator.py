"""Per-segment SNR estimator network.

Parity: reference model/snr_estimator.py:6-129 — a conv tower over segmented
audio ``[B, 1, N, L]`` (ResnetBlock x k + Downsample per channel mult) ending
in an SNRBlock (big-kernel conv collapsing the segment-length axis + a dense
head) that regresses per-segment SI-SNR ``[B, N]``.

NHWC layout here: input ``[B, N, L, 1]`` internally; the public call contract
stays ``[B, 1, N, L]`` to match the composite models.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import Block, Downsample, swish

class SNRResnetBlock(nn.Module):
    """ResnetBlock WITHOUT noise injection (reference model/snr_estimator.py:37-47)."""

    dim_out: int
    norm_groups: int = 32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = Block(self.dim_out, groups=self.norm_groups, dropout=self.dropout)(
            x, deterministic
        )
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=x.dtype)(x)
        return h + x


class SNRBlock(nn.Module):
    """Collapse the segment-length axis with a big-kernel strided conv, then a
    dense head to per-segment SNR (reference model/snr_estimator.py:49-67)."""

    dim: int
    len_segment_in: int
    n_segment_out: int
    norm_groups: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, N, L, C]; conv kernel (L, L) stride (L, L) -> [B, N/L, 1, C*L]
        b = x.shape[0]
        dim_out = self.dim * self.len_segment_in
        k = self.len_segment_in
        h = nn.Conv(dim_out, (k, k), strides=(k, k), dtype=x.dtype)(x)
        h = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5, dtype=jnp.float32)(h)
        h = swish(h).astype(x.dtype)
        h = h.reshape(b, -1)
        return nn.Dense(self.n_segment_out, dtype=x.dtype)(h)


class SNREstimator(nn.Module):
    """Conv tower -> SNRBlock -> [B, n_segments]
    (reference model/snr_estimator.py:70-129)."""

    n_segments: int
    segment_len: int
    inner_channel: int = 32
    norm_groups: int = 32
    channel_mults: Sequence[int] = (1, 2, 3, 4, 5)
    res_blocks: int = 3
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x: [B, 1, N, L] segmented audio -> [B, n_segments] SNR estimates."""
        h = jnp.moveaxis(x, 1, -1).astype(self.dtype)  # [B, N, L, 1]
        n_segment_now, segment_len_now = self.n_segments, self.segment_len

        h = nn.Conv(self.inner_channel, (3, 3), padding="SAME", dtype=self.dtype)(h)
        for mult in self.channel_mults:
            n_out = self.inner_channel * mult
            for _ in range(self.res_blocks):
                h = SNRResnetBlock(
                    n_out, norm_groups=self.norm_groups, dropout=self.dropout
                )(h, deterministic)
            h = Downsample(n_out)(h)
            n_segment_now //= 2
            segment_len_now //= 2

        h = SNRResnetBlock(
            h.shape[-1], norm_groups=self.norm_groups, dropout=self.dropout
        )(h, deterministic)

        out = SNRBlock(
            dim=h.shape[-1],
            len_segment_in=segment_len_now,
            n_segment_out=self.n_segments,
            norm_groups=self.norm_groups,
        )(h)
        return out.astype(jnp.float32)
