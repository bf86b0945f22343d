"""Wave-U-Net denoisers (1-D raw-waveform U-Nets).

Parity targets:
  - ``Waveunet``  (reference model/waveunet.py:358-506): 12-level U-Net with
    FiLM shortcut conditioning (:42-61), gn/normal ConvLayers (:206-265),
    learned transposed-conv or fixed sinc low-pass resampling (:107-203), and
    the get_output_size geometry checks (:401-426).
  - ``Waveunet2`` (reference model/waveunet2.py:226-324): simplified 4-level
    variant with separate down/up/bottleneck kernel sizes.

NLC layout ``[B, T, C]``.  The reference's shipped configs construct Waveunet
with a ``num_samples`` kwarg its ctor does not accept (it would crash —
SURVEY-level quirk); here ``num_samples`` is accepted and drives the same
geometry self-check.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .wavegrad import WaveGradPositionalEncoding

def build_sinc_filter(kernel_size: int, cutoff: float) -> np.ndarray:
    """Blackman-windowed sinc low-pass (reference waveunet.py:88-103,
    including its fixed ``cos(4*pi*M)`` window term)."""
    assert kernel_size % 2 == 1
    M = kernel_size - 1
    filt = np.zeros(kernel_size, dtype=np.float32)
    for i in range(kernel_size):
        if i == M // 2:
            filt[i] = 2 * np.pi * cutoff
        else:
            filt[i] = (
                np.sin(2 * np.pi * cutoff * (i - M // 2)) / (i - M // 2)
            ) * (
                0.42
                - 0.5 * np.cos((2 * np.pi * i) / M)
                + 0.08 * np.cos(4 * np.pi * M)
            )
    return filt / np.sum(filt)


class ResampleSinc(nn.Module):
    """Fixed (optionally trainable) sinc low-pass resampler, depthwise
    (reference waveunet.py:107-160)."""

    channels: int
    kernel_size: int = 15
    stride: int = 2
    transpose: bool = False
    trainable: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, T, C]
        init = build_sinc_filter(self.kernel_size, 0.5 / self.stride)
        if self.trainable:
            filt = self.param(
                "filter",
                lambda _k: jnp.tile(
                    jnp.asarray(init)[None, :], (self.channels, 1)
                ),
            )
        else:
            filt = jnp.tile(jnp.asarray(init)[None, :], (self.channels, 1))
        # depthwise kernel [k, 1, C] for feature_group_count=C
        kernel = jnp.swapaxes(filt, 0, 1)[:, None, :].astype(x.dtype)
        pad = (self.kernel_size - 1) // 2
        if self.transpose:
            # transposed conv == lhs-dilated conv with flipped kernel
            # (conv_transpose has no grouping; this formulation does)
            k = self.kernel_size
            out = jax.lax.conv_general_dilated(
                jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect"),
                jnp.flip(kernel, axis=0),
                window_strides=(1,),
                padding=((k - 1, k - 1),),
                lhs_dilation=(self.stride,),
                dimension_numbers=("NHC", "HIO", "NHC"),
                feature_group_count=self.channels,
            )
            expected = (x.shape[1] - 1) * self.stride + 1
            diff = out.shape[1] - expected
            if diff > 0:
                out = out[:, diff // 2 : -(diff - diff // 2), :]
            return out
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(self.stride,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.channels,
        )


class ConvLayer(nn.Module):
    """Conv/ConvTranspose + GroupNorm(C/8)+relu ("gn") or leaky_relu
    ("normal") (reference waveunet.py:206-265)."""

    n_outputs: int
    kernel_size: int
    stride: int
    conv_type: str = "gn"
    padding: Any = "same"  # int or 'same'; ignored for transpose
    transpose: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.transpose:
            pad = (self.kernel_size - self.stride) // 2
            h = nn.ConvTranspose(
                self.n_outputs, (self.kernel_size,), strides=(self.stride,),
                padding="VALID", dtype=x.dtype,
            )(x)
            if pad > 0:
                h = h[:, pad:-pad, :]
        else:
            if self.padding == "same":
                padding = "SAME"
            else:
                padding = ((int(self.padding), int(self.padding)),)
            h = nn.Conv(
                self.n_outputs, (self.kernel_size,), strides=(self.stride,),
                padding=padding, dtype=x.dtype,
            )(x)
        if self.conv_type == "gn":
            assert self.n_outputs % 8 == 0
            h = nn.GroupNorm(num_groups=self.n_outputs // 8, epsilon=1e-5,
                          dtype=jnp.float32)(h).astype(x.dtype)
            return nn.relu(h)
        if self.conv_type == "normal":
            return nn.leaky_relu(h, 0.01)
        raise NotImplementedError(
            f"conv_type '{self.conv_type}' (bn unused by shipped configs)"
        )


class FiLM1D(nn.Module):
    """FiLM over NLC features (reference waveunet.py:42-61 — identical to the
    WaveGrad FiLM; xavier-init convs)."""

    input_size: int
    output_size: int

    @nn.compact
    def __call__(self, x, noise_level):
        xavier = nn.initializers.xavier_uniform()
        h = nn.Conv(self.input_size, (3,), padding="SAME",
                    kernel_init=xavier, dtype=x.dtype)(x)
        h = nn.leaky_relu(h, 0.2)
        h = WaveGradPositionalEncoding(self.input_size)(h, noise_level)
        h = nn.Conv(self.output_size * 2, (3,), padding="SAME",
                    kernel_init=xavier, dtype=x.dtype)(h)
        return jnp.split(h, 2, axis=-1)


class _DownBlock(nn.Module):
    """pre convs -> post convs -> strided downsample; returns (out, shortcut)
    (reference waveunet.py:315-356 / waveunet2.py:188-224)."""

    n_shortcut: int
    n_outputs: int
    kernel_size: int
    depth: int
    conv_type: str
    res: str
    resample_kernel_size: int
    resample_stride: int

    @nn.compact
    def __call__(self, x):
        h = ConvLayer(self.n_shortcut, self.kernel_size, 1, self.conv_type)(x)
        for _ in range(self.depth - 1):
            h = ConvLayer(self.n_shortcut, self.kernel_size, 1, self.conv_type)(h)
        shortcut = h
        out = ConvLayer(self.n_outputs, self.kernel_size, 1, self.conv_type)(shortcut)
        for _ in range(self.depth - 1):
            out = ConvLayer(self.n_outputs, self.kernel_size, 1, self.conv_type)(out)
        if self.res == "fixed":
            out = ResampleSinc(self.n_outputs, 15, self.resample_stride)(out)
        else:
            pad = (self.resample_kernel_size - self.resample_stride) // 2
            out = ConvLayer(
                self.n_outputs, self.resample_kernel_size,
                self.resample_stride, self.conv_type, padding=pad,
            )(out)
        return out, shortcut


class _UpBlock(nn.Module):
    """transposed upsample -> pre convs -> FiLM-modulated post convs
    (reference waveunet.py:269-306 / waveunet2.py:149-186)."""

    n_shortcut: int
    n_outputs: int
    kernel_size: int
    depth: int
    conv_type: str
    res: str
    resample_kernel_size: int
    resample_stride: int

    @nn.compact
    def __call__(self, x, film_shift, film_scale):
        if self.res == "fixed":
            h = ResampleSinc(x.shape[-1], 15, self.resample_stride,
                             transpose=True)(x)
        else:
            h = ConvLayer(
                x.shape[-1], self.resample_kernel_size, self.resample_stride,
                self.conv_type, transpose=True,
            )(x)
        h = ConvLayer(self.n_shortcut, self.kernel_size, 1, self.conv_type)(h)
        for _ in range(self.depth - 1):
            h = ConvLayer(self.n_shortcut, self.kernel_size, 1, self.conv_type)(h)
        for i in range(self.depth - 1):
            h = ConvLayer(self.n_shortcut, self.kernel_size, 1, self.conv_type)(
                film_scale * h + film_shift
            )
        h = ConvLayer(self.n_outputs, self.kernel_size, 1, self.conv_type)(
            film_scale * h + film_shift
        )
        return h


class Waveunet(nn.Module):
    """12-level FiLM Wave-U-Net (reference waveunet.py:358-506)."""

    num_inputs: int = 2
    num_channels: Sequence[int] = (24, 48, 72, 96, 120, 144, 168, 192, 216,
                                   240, 264, 288)
    kernel_size: int = 5
    conv_type: str = "gn"
    res: str = "learned"
    depth: int = 1
    resample_kernel_size: int = 4
    resample_stride: int = 2
    num_samples: Optional[int] = None  # accepted for config parity
    input_size: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, condition, x_t, noise_level, deterministic=True):
        h = jnp.concatenate(
            [jnp.swapaxes(condition, 1, 2), jnp.swapaxes(x_t, 1, 2)], axis=-1
        ).astype(self.dtype)

        ch = list(self.num_channels)
        films = []
        for i in range(len(ch) - 1):
            h, short = _DownBlock(
                ch[i], ch[i + 1], self.kernel_size, self.depth,
                self.conv_type, self.res, self.resample_kernel_size,
                self.resample_stride,
            )(h)
            films.append(FiLM1D(ch[i], ch[i])(short, noise_level))

        for _ in range(self.depth):
            h = ConvLayer(ch[-1], self.kernel_size, 1, self.conv_type)(h)

        for i, (shift, scale) in zip(
            range(len(ch) - 1, 0, -1), reversed(films)
        ):
            h = _UpBlock(
                ch[i - 1], ch[i - 1], self.kernel_size, self.depth,
                self.conv_type, self.res, self.resample_kernel_size,
                self.resample_stride,
            )(h, shift, scale)

        out = nn.Conv(1, (1,), dtype=self.dtype)(h)
        if deterministic:  # eval-time clamp (reference waveunet.py:503-504)
            out = jnp.clip(out, -1.0, 1.0)
        return jnp.swapaxes(out, 1, 2).astype(x_t.dtype)


class Waveunet2(nn.Module):
    """4-level simplified Wave-U-Net (reference waveunet2.py:226-324)."""

    num_inputs: int = 2
    num_channels: Sequence[int] = (24, 48, 72, 96)
    downconv_kernel_size: int = 5
    upconv_kernel_size: int = 5
    bottleneck_kernel_size: int = 5
    conv_stride: int = 1
    conv_type: str = "gn"
    depth: int = 1
    downsample_kernel_size: int = 4
    upsample_kernel_size: int = 4
    resample_stride: int = 2
    num_samples: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, condition, x_t, noise_level, deterministic=True):
        h = jnp.concatenate(
            [jnp.swapaxes(condition, 1, 2), jnp.swapaxes(x_t, 1, 2)], axis=-1
        ).astype(self.dtype)

        ch = list(self.num_channels)
        films = []
        for i in range(len(ch) - 1):
            h, short = _DownBlock(
                ch[i], ch[i + 1], self.downconv_kernel_size, self.depth,
                self.conv_type, "learned", self.downsample_kernel_size,
                self.resample_stride,
            )(h)
            films.append(FiLM1D(ch[i], ch[i])(short, noise_level))

        for _ in range(self.depth):
            h = ConvLayer(ch[-1], self.bottleneck_kernel_size, 1,
                          self.conv_type)(h)

        for i, (shift, scale) in zip(
            range(len(ch) - 1, 0, -1), reversed(films)
        ):
            h = _UpBlock(
                ch[i - 1], ch[i - 1], self.upconv_kernel_size, self.depth,
                self.conv_type, "learned", self.upsample_kernel_size,
                self.resample_stride,
            )(h, shift, scale)

        out = nn.Conv(1, (1,), dtype=self.dtype)(h)
        if deterministic:
            out = jnp.clip(out, -1.0, 1.0)
        return jnp.swapaxes(out, 1, 2).astype(x_t.dtype)
