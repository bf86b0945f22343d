"""Shared denoiser building blocks (Flax linen).

Parity targets are the block modules shared across the reference denoiser zoo
(model/UNetModified2.py:44-143, model/UNetModified.py:140-189); each class
cites its source.

TPU-first conventions:
  - NHWC layout everywhere (``[B, n_frames, frame_len, C]``) — the TPU-native
    conv layout; the reference uses NCHW.
  - Compute dtype is configurable (bf16 for MXU throughput), params stay f32.
  - GroupNorm/normalizations run in f32 for stability.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# Experimental escape hatch (tools/perf_probe.py): when True, Block inserts
# an optimization barrier between its input (the previous conv's output) and
# the GroupNorm statistics, preventing XLA from fusing the stat reduction
# into the producing convolution — inside while-loop bodies that fusion can
# knock the conv off the fast emitter path.
_ENTRY_BARRIER = False


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(x) (reference model/UNetModified2.py:44-46)."""
    return jax.nn.silu(x)


# ---------------------------------------------------------------------------
# PyTorch-default initialization.
#
# The reference trains every module with torch's layer defaults:
# kaiming_uniform(a=sqrt(5)) kernels (limit = 1/sqrt(fan_in)) and
# U(+-1/sqrt(fan_in)) biases.  Flax's default (lecun_normal kernels, zero
# biases) has 3x larger kernel variance — at flagship depth (5 levels,
# 32 groups) that initialization drives the net into a predict-zero plateau
# the optimizer escapes only very slowly, while the torch init trains
# immediately (verified empirically on the synth corpus, round 2).
# ---------------------------------------------------------------------------

# limit = sqrt(3 * scale / fan_in) == 1/sqrt(fan_in) at scale 1/3, which is
# exactly torch's kaiming_uniform(a=sqrt(5)) for conv/linear weights.
TORCH_KERNEL_INIT = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                     "uniform")


def _uniform_bias(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_conv(in_ch: int, features: int, kernel_size, **kw) -> nn.Conv:
    """``nn.Conv`` with torch.nn.Conv{1,2}d's default initialization.
    ``in_ch`` is the input's channel count (x.shape[-1] at the call site)."""
    k = kernel_size if isinstance(kernel_size, (tuple, list)) else (kernel_size,)
    fan_in = in_ch * int(np.prod(k))
    return nn.Conv(features, kernel_size, kernel_init=TORCH_KERNEL_INIT,
                   bias_init=_uniform_bias(fan_in), **kw)


def torch_conv_transpose(out_ch: int, features: int, kernel_size, **kw
                         ) -> nn.ConvTranspose:
    """``nn.ConvTranspose`` with torch.nn.ConvTranspose{1,2}d defaults.
    torch computes fan_in from weight dim 1 — the OUTPUT channels for
    transposed convs — so the limit uses out_ch * prod(kernel)."""
    k = kernel_size if isinstance(kernel_size, (tuple, list)) else (kernel_size,)
    fan_in = out_ch * int(np.prod(k))
    bound_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_out",
                                                  "uniform")
    return nn.ConvTranspose(features, kernel_size, kernel_init=bound_init,
                            bias_init=_uniform_bias(fan_in), **kw)


def torch_dense(in_features: int, features: int, **kw) -> nn.Dense:
    """``nn.Dense`` with torch.nn.Linear's default initialization."""
    return nn.Dense(features, kernel_init=TORCH_KERNEL_INIT,
                    bias_init=_uniform_bias(in_features), **kw)


class PositionalEncoding(nn.Module):
    """Sinusoidal encoding of a (continuous) noise level / diffusion step.

    Parity: reference model/UNetModified2.py:49-68 — the frequency vector is
    ``1e4 * 10**(-step * 4 / half_dim)`` and the output is
    ``concat[sin, cos]`` of ``level * vector``; input of any shape is
    flattened to ``[B, 1]``.
    """

    dim: int = 128

    @nn.compact
    def __call__(self, diffusion_step: jnp.ndarray) -> jnp.ndarray:
        half_dim = self.dim // 2
        step = np.arange(half_dim, dtype=np.float32)
        vector = jnp.asarray(
            1e4 * 10.0 ** (-step * 4.0 / half_dim), diffusion_step.dtype
        )
        x = diffusion_step.reshape(-1, 1) * vector[None, :]
        return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)  # [B, dim]


class FeatureWiseAffine(nn.Module):
    """Inject a noise embedding into a feature map per channel.

    Parity: reference model/UNetModified2.py:72-89.  ``use_affine_level=False``
    adds a per-channel bias; True applies ``(1 + gamma) * x + beta``.
    NHWC: the projected embedding broadcasts as ``[B, 1, 1, C]``.
    """

    out_channels: int
    use_affine_level: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, noise_embed: jnp.ndarray) -> jnp.ndarray:
        batch = x.shape[0]
        n_out = self.out_channels * (2 if self.use_affine_level else 1)
        h = torch_dense(noise_embed.shape[-1], n_out, dtype=x.dtype)(noise_embed)
        h = h.reshape((batch,) + (1,) * (x.ndim - 2) + (-1,))
        if self.use_affine_level:
            gamma, beta = jnp.split(h, 2, axis=-1)
            return (1.0 + gamma) * x + beta
        return x + h


class Block(nn.Module):
    """GroupNorm -> Swish -> Dropout -> 3x3 Conv
    (reference model/UNetModified2.py:113-124).

    ``norm_dtype``: compute dtype for the GroupNorm's normalize/affine
    arithmetic.  Mean/var statistics are ALWAYS f32 (flax upcasts half
    dtypes internally); ``None`` inherits the input dtype (bf16 in mixed
    precision), which removes the f32 convert round-trips around every
    norm — the dominant non-conv cost on TPU (PERFORMANCE.md).  f32-mode
    numerics are identical either way."""

    dim_out: int
    groups: int = 32
    dropout: float = 0.0
    norm_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if _ENTRY_BARRIER:
            x = jax.lax.optimization_barrier(x)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.norm_dtype)(x)
        h = swish(h).astype(x.dtype)
        if self.dropout > 0:
            h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        return torch_conv(x.shape[-1], self.dim_out, (3, 3), padding="SAME",
                          dtype=x.dtype)(h)


class ResnetBlock(nn.Module):
    """Block -> FeatureWiseAffine(noise) -> Block -> +residual
    (reference model/UNetModified2.py:127-142)."""

    dim_out: int
    dropout: float = 0.0
    norm_groups: int = 32
    use_affine_level: bool = False
    norm_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        time_emb: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        h = Block(self.dim_out, groups=self.norm_groups,
                  norm_dtype=self.norm_dtype)(x, deterministic)
        h = FeatureWiseAffine(self.dim_out, self.use_affine_level)(h, time_emb)
        h = Block(self.dim_out, groups=self.norm_groups, dropout=self.dropout,
                  norm_dtype=self.norm_dtype)(
            h, deterministic
        )
        if x.shape[-1] != self.dim_out:
            x = torch_conv(x.shape[-1], self.dim_out, (1, 1), dtype=x.dtype)(x)
        return h + x


class Downsample(nn.Module):
    """Stride-2 3x3 conv, channels preserved (model/UNetModified2.py:103-109).

    Explicit (1,1) padding: torch's padding=1 pads both sides, while SAME
    with stride 2 on even sizes pads (0,1) — same output size, shifted
    windows (breaks checkpoint-import parity)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return torch_conv(
            x.shape[-1], self.dim, (3, 3), strides=(2, 2),
            padding=((1, 1), (1, 1)), dtype=x.dtype,
        )(x)


class Upsample(nn.Module):
    """2x nearest upsample then 3x3 conv (model/UNetModified2.py:93-100)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        up = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return torch_conv(c, self.dim, (3, 3), padding="SAME",
                          dtype=x.dtype)(up)


class SelfAttention2D(nn.Module):
    """Multi-head self-attention over the (H, W) grid with per-head channel
    dim C/heads.

    Parity: reference model/UNetModified.py:140-169 — qkv from a 1x1 conv on
    GroupNorm-ed input, attention einsum over flattened spatial positions,
    scaled by 1/sqrt(C), residual add.  NHWC here; the einsum contracts the
    head channel dim, exactly the reference's
    ``bnchw,bncyx->bnhwyx`` in NHWC form.
    """

    n_head: int = 1
    norm_groups: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        head_dim = c // self.n_head
        norm = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5, dtype=jnp.float32)(x)
        norm = norm.astype(x.dtype)
        qkv = torch_conv(c, c * 3, (1, 1), use_bias=False, dtype=x.dtype)(norm)
        # torch chunks the conv channels per head as [q(d), k(d), v(d)]
        # blocks (UNetModified.py:155-156) — reshape (n_head, 3, d), NOT
        # (n_head, d, 3), or imported qkv weights would be interleaved
        qkv = qkv.reshape(b, h * w, self.n_head, 3, head_dim)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]  # [B,HW,n,d]
        attn = jnp.einsum("bsnd,btnd->bnst", q, k) / jnp.sqrt(
            jnp.asarray(c, x.dtype)
        )
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnst,btnd->bsnd", attn, v).reshape(b, h, w, c)
        proj = torch_conv(c, c, (1, 1), dtype=x.dtype)(out)
        return x + proj


class ResnetBlocWithAttn(nn.Module):
    """ResnetBlock optionally followed by self-attention
    (reference model/UNetModified.py:172-189)."""

    dim_out: int
    norm_groups: int = 32
    dropout: float = 0.0
    with_attn: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        time_emb: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        h = ResnetBlock(
            self.dim_out, dropout=self.dropout, norm_groups=self.norm_groups
        )(x, time_emb, deterministic)
        if self.with_attn:
            h = SelfAttention2D(norm_groups=self.norm_groups)(h)
        return h


class NoiseLevelMLP(nn.Module):
    """PositionalEncoding -> Dense(4x) -> Swish -> Dense(1x) -> Swish
    (reference model/UNetModified2.py:168-174)."""

    channel: int

    @nn.compact
    def __call__(self, diffusion_step: jnp.ndarray) -> jnp.ndarray:
        t = PositionalEncoding(self.channel)(diffusion_step)
        t = torch_dense(self.channel, self.channel * 4, dtype=t.dtype)(t)
        t = swish(t)
        t = torch_dense(self.channel * 4, self.channel, dtype=t.dtype)(t)
        return swish(t)
