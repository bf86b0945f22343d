"""Waveunet3 — ResnetBlocWithAttn Wave-U-Net with raw-scalar noise level.

Parity: reference model/waveunet3.py:314-416 — 1-D GroupNorm+Swish ResNet
blocks everywhere (:58-89), optional 1-D self-attention (:93-121), raw noise
level injected via ``FeatureWiseAffine(1 -> C)`` per block (:35-52), additive
(not concat) skip connections, and the first down block group-normed with
``in_ch`` groups.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import swish
from .waveunet import ConvLayer


class FeatureWiseAffine1D(nn.Module):
    """Dense noise injection broadcast over time (reference waveunet3.py:35-52)."""

    out_channels: int
    use_affine_level: bool = False

    @nn.compact
    def __call__(self, x, noise_embed):
        # x: [B, T, C]; noise_embed: anything flattening to [B, emb]
        b = x.shape[0]
        n_out = self.out_channels * (2 if self.use_affine_level else 1)
        h = nn.Dense(n_out, dtype=x.dtype)(noise_embed.reshape(b, -1))
        h = h[:, None, :]
        if self.use_affine_level:
            gamma, beta = jnp.split(h, 2, axis=-1)
            return (1 + gamma) * x + beta
        return x + h


class Block1D(nn.Module):
    """GroupNorm -> Swish -> Dropout -> same-pad conv (reference :58-69)."""

    dim_out: int
    kernel_size: int
    groups: int = 32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=jnp.float32)(x)
        h = swish(h).astype(x.dtype)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Conv(self.dim_out, (self.kernel_size,), padding="SAME",
                       dtype=x.dtype)(h)


class ResnetBlock1D(nn.Module):
    dim_out: int
    kernel_size: int
    dropout: float = 0.0
    norm_groups: int = 32
    use_affine_level: bool = False

    @nn.compact
    def __call__(self, x, noise_level, deterministic=True):
        h = Block1D(self.dim_out, self.kernel_size, self.norm_groups)(
            x, deterministic
        )
        h = FeatureWiseAffine1D(self.dim_out, self.use_affine_level)(
            h, noise_level
        )
        h = Block1D(self.dim_out, self.kernel_size, self.norm_groups,
                    self.dropout)(h, deterministic)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1,), dtype=x.dtype)(x)
        return h + x


class SelfAttention1D(nn.Module):
    """1-D self-attention over time (reference waveunet3.py:93-121)."""

    n_head: int = 1
    norm_groups: int = 32

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        head_dim = c // self.n_head
        norm = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5, dtype=jnp.float32)(x)
        qkv = nn.Conv(c * 3, (1,), use_bias=False, dtype=x.dtype)(
            norm.astype(x.dtype)
        )
        # torch chunks the conv channels per head as [q(d), k(d), v(d)]
        # blocks (reference waveunet3.py:108-109) — reshape (n_head, 3, d),
        # NOT (n_head, d, 3), or imported qkv weights would be interleaved
        qkv = qkv.reshape(b, t, self.n_head, 3, head_dim)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        attn = jnp.einsum("bsnd,btnd->bnst", q, k) / math.sqrt(c)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnst,btnd->bsnd", attn, v).reshape(b, t, c)
        return x + nn.Conv(c, (1,), dtype=x.dtype)(out)


class ResnetBlocWithAttn1D(nn.Module):
    dim_out: int
    kernel_size: int
    norm_groups: int = 32
    dropout: float = 0.0
    with_attn: bool = False

    @nn.compact
    def __call__(self, x, noise_level, deterministic=True):
        h = ResnetBlock1D(
            self.dim_out, self.kernel_size, self.dropout, self.norm_groups
        )(x, noise_level, deterministic)
        if self.with_attn:
            h = SelfAttention1D(norm_groups=self.norm_groups)(h)
        return h


class Waveunet3(nn.Module):
    num_inputs: int = 2
    num_channels: Sequence[int] = (32, 64, 96, 128)
    downconv_kernel_size: int = 5
    upconv_kernel_size: int = 5
    bottleneck_kernel_size: int = 5
    conv_stride: int = 1
    conv_type: str = "gn"
    downsample_kernel_size: int = 4
    upsample_kernel_size: int = 4
    resample_stride: int = 2
    with_noise_level_emb: bool = False
    norm_groups: int = 32
    with_attn: bool = True
    dropout: float = 0.0
    num_samples: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, condition, x_t, noise_level, deterministic=True):
        if self.with_noise_level_emb:
            raise NotImplementedError  # matches reference waveunet3.py:330
        ch = list(self.num_channels)
        assert ch[0] == self.norm_groups  # reference :322

        h = jnp.concatenate(
            [jnp.swapaxes(condition, 1, 2), jnp.swapaxes(x_t, 1, 2)], axis=-1
        ).astype(self.dtype)
        nl = noise_level.astype(self.dtype)

        shorts = []
        for i in range(len(ch) - 1):
            groups = self.num_inputs if i == 0 else self.norm_groups
            short = ResnetBlocWithAttn1D(
                ch[i], self.downconv_kernel_size, groups, self.dropout,
                self.with_attn,
            )(h, nl, deterministic)
            out = ResnetBlocWithAttn1D(
                ch[i + 1], self.downconv_kernel_size, groups, self.dropout,
                self.with_attn,
            )(short, nl, deterministic)
            pad = (self.downsample_kernel_size - self.resample_stride) // 2
            h = ConvLayer(
                ch[i + 1], self.downsample_kernel_size, self.resample_stride,
                self.conv_type, padding=pad,
            )(out)
            shorts.append(short)

        h = ResnetBlocWithAttn1D(
            ch[-1], self.bottleneck_kernel_size, self.norm_groups,
            self.dropout, self.with_attn,
        )(h, nl, deterministic)
        h = ResnetBlocWithAttn1D(
            ch[-1], self.bottleneck_kernel_size, self.norm_groups,
            self.dropout, False,
        )(h, nl, deterministic)

        for i, short in zip(range(len(ch) - 1, 0, -1), reversed(shorts)):
            h = ConvLayer(
                h.shape[-1], self.upsample_kernel_size, self.resample_stride,
                self.conv_type, transpose=True,
            )(h)
            h = ResnetBlocWithAttn1D(
                ch[i - 1], self.upconv_kernel_size, self.norm_groups,
                self.dropout, self.with_attn,
            )(h, nl, deterministic)
            h = h + short
            h = ResnetBlocWithAttn1D(
                ch[i - 1], self.upconv_kernel_size, self.norm_groups,
                self.dropout, self.with_attn,
            )(h, nl, deterministic)

        out = nn.Conv(1, (1,), dtype=self.dtype)(h)
        if deterministic:
            out = jnp.clip(out, -1.0, 1.0)
        return jnp.swapaxes(out, 1, 2).astype(x_t.dtype)
