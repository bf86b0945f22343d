"""WaveGrad vocoder + DenoiseWaveGrad denoiser variants.

Parity: reference model/wavegrad.py — orthogonally-initialized Conv1d (:9-16),
continuous-noise-level FiLM conditioning (:20-71), DBlock downsampling
(:115-137), dilated UBlock upsampling (:74-112), and four topologies:
``WaveGrad`` (:140-179, spectrogram vocoder, factors 5*5*3*2*2 = 300 = hop),
``DenoiseWaveGrad1`` (:184-242, separate condition branch),
``DenoiseWaveGrad2`` (:245-304, concat input, 9 levels deep),
``DenoiseWaveGrad3`` (:307-353, concat input + extra bottleneck DBlock).

TPU-first: NLC layout ``[B, T, C]`` so the 1-D convs hit the MXU as batched
matmuls; torch-exact nearest resampling via strided slice / repeat.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _conv1d(features, kernel, dilation=1, init="orthogonal", dtype=jnp.float32):
    if init == "orthogonal":
        kernel_init = nn.initializers.orthogonal()
    elif init == "xavier":
        kernel_init = nn.initializers.xavier_uniform()
    else:
        kernel_init = nn.initializers.lecun_normal()
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features, (kernel,), kernel_dilation=(dilation,),
        padding=((pad, pad),), kernel_init=kernel_init,
        bias_init=nn.initializers.zeros, dtype=dtype,
    )


def _resize_time(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Nearest-neighbor resample along the time axis of [B, T, C].

    Matches torch ``F.interpolate(mode='nearest')`` exactly: source index is
    ``floor(i * T / size)`` (torch uses asymmetric/floor coordinates, NOT
    half-pixel centers — jax.image.resize's nearest picks different samples
    when downsampling).  Integer factors lower to a strided slice (down) or
    broadcast-repeat (up) — no gather."""
    t = x.shape[1]
    if size == t:
        return x
    if size % t == 0:
        return jnp.repeat(x, size // t, axis=1)
    if t % size == 0:
        return x[:, :: t // size, :]
    idx = (np.arange(size) * t) // size
    return x[:, idx, :]


class WaveGradPositionalEncoding(nn.Module):
    """Continuous-noise-level encoding added per channel
    (reference wavegrad.py:20-49): enc = sqrt_alpha_bar * exp(-ln(1e4) *
    (arange(dim/2)/(dim/2))), concat sin/cos, broadcast over time."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, noise_level: jnp.ndarray) -> jnp.ndarray:
        count = self.dim // 2
        step = np.arange(count, dtype=np.float32) / count
        vector = jnp.asarray(np.exp(-math.log(1e4) * step), x.dtype)
        nl = noise_level.reshape(-1, 1).astype(x.dtype)  # [B, 1]
        enc = nl * vector[None, :]
        enc = jnp.concatenate([jnp.sin(enc), jnp.cos(enc)], axis=-1)  # [B,dim]
        return x + enc[:, None, :]


class FiLM(nn.Module):
    """(shift, scale) from features + noise level (reference wavegrad.py:52-71)."""

    input_size: int
    output_size: int

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, noise_level: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = _conv1d(self.input_size, 3, init="xavier", dtype=x.dtype)(x)
        h = nn.leaky_relu(h, 0.2)
        h = WaveGradPositionalEncoding(self.input_size)(h, noise_level)
        h = _conv1d(self.output_size * 2, 3, init="xavier", dtype=x.dtype)(h)
        shift, scale = jnp.split(h, 2, axis=-1)
        return shift, scale


class DBlock(nn.Module):
    """Downsample by ``factor`` with a dilated conv stack + resampled residual
    (reference wavegrad.py:115-137)."""

    hidden_size: int
    factor: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        size = x.shape[1] // self.factor
        residual = _conv1d(self.hidden_size, 1, dtype=x.dtype)(x)
        residual = _resize_time(residual, size)
        h = _resize_time(x, size)
        for dil in (1, 2, 4):
            h = nn.leaky_relu(h, 0.2)
            h = _conv1d(self.hidden_size, 3, dilation=dil, dtype=x.dtype)(h)
        return h + residual


class UBlock(nn.Module):
    """Upsample by ``factor`` with FiLM-modulated dilated convs
    (reference wavegrad.py:74-112)."""

    hidden_size: int
    factor: int
    dilation: Sequence[int]

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, film_shift: jnp.ndarray, film_scale: jnp.ndarray
    ) -> jnp.ndarray:
        d = self.dilation
        size = x.shape[1] * self.factor
        block1 = _resize_time(x, size)
        block1 = _conv1d(self.hidden_size, 1, dtype=x.dtype)(block1)

        block2 = nn.leaky_relu(x, 0.2)
        block2 = _resize_time(block2, size)
        block2 = _conv1d(self.hidden_size, 3, dilation=d[0], dtype=x.dtype)(block2)
        block2 = film_shift + film_scale * block2
        block2 = nn.leaky_relu(block2, 0.2)
        block2 = _conv1d(self.hidden_size, 3, dilation=d[1], dtype=x.dtype)(block2)

        h = block1 + block2

        block3 = film_shift + film_scale * h
        block3 = nn.leaky_relu(block3, 0.2)
        block3 = _conv1d(self.hidden_size, 3, dilation=d[2], dtype=x.dtype)(block3)
        block3 = film_shift + film_scale * block3
        block3 = nn.leaky_relu(block3, 0.2)
        block3 = _conv1d(self.hidden_size, 3, dilation=d[3], dtype=x.dtype)(block3)

        return h + block3


def _to_nlc(x: jnp.ndarray) -> jnp.ndarray:
    """[B, 1, T] or [B, T] -> [B, T, 1]."""
    if x.ndim == 3:
        return jnp.swapaxes(x, 1, 2)
    return x[:, :, None]


class WaveGrad(nn.Module):
    """Spectrogram-conditioned vocoder (reference wavegrad.py:140-179).

    condition: mel spectrogram [B, n_mels=128, frames]; x_t: audio waveform;
    hop = 300 (factors 5*5*3*2*2).  Returns [B, 1, T] (the reference squeezes
    to [B, T]; kept 3-D for the SDDM call contract)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        condition: jnp.ndarray,
        x_t: jnp.ndarray,
        noise_level: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        audio = _to_nlc(x_t).astype(self.dtype)
        out_len = audio.shape[1]

        down_channels = (32, 128, 128, 256, 512)
        film_out = (128, 128, 256, 512, 512)
        factors = (2, 2, 3, 5)

        h = _conv1d(32, 5, dtype=self.dtype)(audio)
        films = [FiLM(32, film_out[0])(h, noise_level)]
        for i, f in enumerate(factors):
            h = DBlock(down_channels[i + 1], f)(h)
            films.append(
                FiLM(down_channels[i + 1], film_out[i + 1])(h, noise_level)
            )

        spec = jnp.swapaxes(condition.astype(self.dtype), 1, 2)  # [B, frames, n_mels]
        u = _conv1d(768, 3, dtype=self.dtype)(spec)
        ublocks = (
            (512, 5, (1, 2, 1, 2)),
            (512, 5, (1, 2, 1, 2)),
            (256, 3, (1, 2, 4, 8)),
            (128, 2, (1, 2, 4, 8)),
            (128, 2, (1, 2, 4, 8)),
        )
        for (hidden, factor, dil), (shift, scale) in zip(
            ublocks, reversed(films)
        ):
            u = UBlock(hidden, factor, dil)(u, shift, scale)
        out = _conv1d(1, 3, dtype=self.dtype)(u)
        return jnp.swapaxes(out, 1, 2).astype(x_t.dtype)[:, :, :out_len]


class DenoiseWaveGrad1(nn.Module):
    """Separate condition-downsampling branch (reference wavegrad.py:184-242)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, condition, x_t, noise_level, deterministic=True):
        x = _to_nlc(condition).astype(self.dtype)
        y_t = _to_nlc(x_t).astype(self.dtype)

        down_channels = (32, 128, 128, 256, 512)
        film_out = (128, 128, 256, 512, 512)
        factors = (2, 2, 4, 5)

        h = _conv1d(32, 5, dtype=self.dtype)(y_t)
        films = [FiLM(32, film_out[0])(h, noise_level)]
        for i, f in enumerate(factors):
            h = DBlock(down_channels[i + 1], f)(h)
            films.append(
                FiLM(down_channels[i + 1], film_out[i + 1])(h, noise_level)
            )

        hx = _conv1d(32, 5, dtype=self.dtype)(x)
        for ch, f in zip((128, 128, 256, 512, 512), (2, 2, 4, 5, 5)):
            hx = DBlock(ch, f)(hx)

        u = hx
        ublocks = (
            (512, 5, (1, 2, 1, 2)),
            (512, 5, (1, 2, 1, 2)),
            (256, 4, (1, 2, 4, 8)),
            (128, 2, (1, 2, 4, 8)),
            (128, 2, (1, 2, 4, 8)),
        )
        for (hidden, factor, dil), (shift, scale) in zip(
            ublocks, reversed(films)
        ):
            u = UBlock(hidden, factor, dil)(u, shift, scale)
        out = _conv1d(1, 3, dtype=self.dtype)(u)
        return jnp.swapaxes(out, 1, 2).astype(x_t.dtype)


class DenoiseWaveGrad2(nn.Module):
    """Concat input, 9 levels deep (reference wavegrad.py:245-304)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, condition, x_t, noise_level, deterministic=True):
        h = jnp.concatenate(
            [_to_nlc(x_t), _to_nlc(condition)], axis=-1
        ).astype(self.dtype)

        down_channels = (4, 8, 16, 32, 64, 128, 256, 512, 512)
        film_out = (8, 16, 32, 64, 128, 256, 512, 512, 512)

        h = _conv1d(4, 5, dtype=self.dtype)(h)
        films = [FiLM(4, film_out[0])(h, noise_level)]
        for i in range(8):
            h = DBlock(down_channels[i + 1], 2)(h)
            films.append(
                FiLM(down_channels[i + 1], film_out[i + 1])(h, noise_level)
            )

        u = h
        up = ((512, 1), (512, 2), (512, 2), (256, 2), (128, 2), (64, 2),
              (32, 2), (16, 2), (8, 2))
        for (hidden, factor), (shift, scale) in zip(up, reversed(films)):
            u = UBlock(hidden, factor, (1, 2, 4, 8))(u, shift, scale)
        out = _conv1d(1, 3, dtype=self.dtype)(u)
        return jnp.swapaxes(out, 1, 2).astype(x_t.dtype)


class DenoiseWaveGrad3(nn.Module):
    """Concat input + extra bottleneck DBlock (reference wavegrad.py:307-353)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, condition, x_t, noise_level, deterministic=True):
        h = jnp.concatenate(
            [_to_nlc(x_t), _to_nlc(condition)], axis=-1
        ).astype(self.dtype)

        down_channels = (32, 128, 128, 256, 512)
        film_out = (128, 128, 256, 512, 512)
        factors = (2, 2, 3, 5)

        h = _conv1d(32, 5, dtype=self.dtype)(h)
        films = [FiLM(32, film_out[0])(h, noise_level)]
        for i, f in enumerate(factors):
            h = DBlock(down_channels[i + 1], f)(h)
            films.append(
                FiLM(down_channels[i + 1], film_out[i + 1])(h, noise_level)
            )

        u = DBlock(512, 5)(h)
        ublocks = (
            (512, 5, (1, 2, 1, 2)),
            (512, 5, (1, 2, 1, 2)),
            (256, 3, (1, 2, 4, 8)),
            (128, 2, (1, 2, 4, 8)),
            (128, 2, (1, 2, 4, 8)),
        )
        for (hidden, factor, dil), (shift, scale) in zip(
            ublocks, reversed(films)
        ):
            u = UBlock(hidden, factor, dil)(u, shift, scale)
        out = _conv1d(1, 3, dtype=self.dtype)(u)
        return jnp.swapaxes(out, 1, 2).astype(x_t.dtype)
