"""CAUNet — dense-dilated encoder/decoder around a dual-transformer mid.

Parity: reference model/CAUNet.py:307-375 — WaveGrad-style noise encoding
computed once (:44-57) and injected via FeatureWiseAffine at every
EncodeLayer/DecodeLayer (:252-305); DenseBlock dilated-dense convolutions
(:222-250); strided (1,3) downsampling and sub-pixel SPConvTranspose2d
upsampling (with its built-in (0,1) padding, :204-219); Dual_Transformer mid.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.framing import frame_signal, overlap_add
from .blocks import torch_dense
from .tst_blocks import (
    DenseBlock,
    DualTransformer,
    LayerNormLastAxis,
    PReLU,
    SPConvTranspose2d,
)
from .unet_sp import WaveGradPE


def _norm_over_F(h: jnp.ndarray, f: int) -> jnp.ndarray:
    h = jnp.swapaxes(h, -1, -2)
    h = LayerNormLastAxis(f)(h)
    return jnp.swapaxes(h, -1, -2)


class CAFeatureWiseAffine(nn.Module):
    """CAUNet's noise injection — unlike UNetModified2's single-Dense
    FeatureWiseAffine (blocks.py), this is a 2-layer MLP with a per-channel
    PReLU between: Linear(nl -> 4*nl) -> PReLU(4*nl) -> Linear(4*nl ->
    out*(1+affine)) (reference CAUNet.py:59-79)."""

    noise_channels: int
    out_channels: int
    use_affine_level: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, noise_embed: jnp.ndarray) -> jnp.ndarray:
        batch = x.shape[0]
        expand = self.noise_channels * 4
        h = torch_dense(self.noise_channels, expand, dtype=x.dtype)(noise_embed)
        h = PReLU(expand)(h)
        n_out = self.out_channels * (2 if self.use_affine_level else 1)
        h = torch_dense(expand, n_out, dtype=x.dtype)(h)
        h = h.reshape((batch,) + (1,) * (x.ndim - 2) + (-1,))
        if self.use_affine_level:
            gamma, beta = jnp.split(h, 2, axis=-1)
            return (1.0 + gamma) * x + beta
        return x + h


class EncodeLayer(nn.Module):
    """noise inject -> DenseBlock -> strided (1,3) downsample
    (reference CAUNet.py:252-275)."""

    n_channels: int
    frame_length: int
    depth: int = 5
    use_affine_level: bool = False

    @nn.compact
    def __call__(self, x, noise_embed):
        h = CAFeatureWiseAffine(
            self.n_channels, self.n_channels, self.use_affine_level
        )(x, noise_embed)
        h = DenseBlock(self.frame_length, self.depth, self.n_channels)(h)
        h = nn.Conv(
            self.n_channels, (1, 3), strides=(1, 2),
            padding=((0, 0), (1, 1)), dtype=x.dtype,
        )(h)
        h = _norm_over_F(h, self.frame_length // 2)
        return PReLU(self.n_channels)(h)


class DecodeLayer(nn.Module):
    """noise inject -> DenseBlock -> concat skip -> sub-pixel upsample
    (reference CAUNet.py:278-305)."""

    n_channels: int
    frame_length: int
    depth: int = 5
    use_affine_level: bool = False

    @nn.compact
    def __call__(self, x, skip, noise_embed):
        h = CAFeatureWiseAffine(
            self.n_channels, self.n_channels, self.use_affine_level
        )(x, noise_embed)
        h = DenseBlock(self.frame_length, self.depth, self.n_channels)(h)
        h = jnp.concatenate([h, skip], axis=-1)
        # CAUNet's SPConvTranspose2d pads (0,1) internally (CAUNet.py:210)
        h = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (0, 0)))
        h = SPConvTranspose2d(self.n_channels, (1, 3), r=2)(h)
        h = _norm_over_F(h, self.frame_length * 2)
        return PReLU(self.n_channels)(h)


class CAUNet(nn.Module):
    num_samples: int
    inner_channel: int = 64
    n_encode_layers: int = 4
    dense_depth: int = 3
    n_TSTB: int = 6
    segment_len: int = 128
    segment_stride: int = 64
    use_affine_level: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, condition, x_t, noise_level, deterministic=True):
        in_dtype = x_t.dtype
        cond_f = frame_signal(
            condition[:, 0, :], self.segment_len, self.segment_stride
        )
        xt_f = frame_signal(x_t[:, 0, :], self.segment_len, self.segment_stride)
        h = jnp.stack([cond_f, xt_f], axis=-1).astype(self.dtype)

        noise_embed = WaveGradPE(self.inner_channel)(
            noise_level.astype(self.dtype)
        )  # [B, inner_channel], computed once (CAUNet.py:357-358)

        h = nn.Conv(self.inner_channel, (1, 1), dtype=self.dtype)(h)
        feats = []
        current_len = self.segment_len
        for _ in range(self.n_encode_layers):
            h = EncodeLayer(
                self.inner_channel, current_len, self.dense_depth,
                self.use_affine_level,
            )(h, noise_embed)
            feats.append(h)
            current_len //= 2

        h = DualTransformer(
            self.inner_channel, self.inner_channel, num_layers=self.n_TSTB,
            per_channel_prelu=True, output_conv_first=True,
        )(h, deterministic)

        for _ in range(self.n_encode_layers):
            h = DecodeLayer(
                self.inner_channel, current_len, self.dense_depth,
                self.use_affine_level,
            )(h, feats.pop(), noise_embed)
            current_len *= 2

        out = nn.Conv(1, (1, 1), dtype=self.dtype)(h)
        out = jnp.moveaxis(out, -1, 1).astype(in_dtype)
        return overlap_add(out, self.num_samples, self.segment_stride)
