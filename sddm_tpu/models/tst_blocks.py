"""Two-stage-transformer (TSTNN-family) shared blocks.

Parity targets (reference model/tstnn.py):
  - ``TransformerEncoderLayer`` :43-111 — self-attention + a GRU feed-forward
    (bidirectional GRU with hidden 2*d, linear back to d), post-norm residuals.
  - ``Dual_Transformer``        :114-164 — dual-path row/col factorized
    attention over the [frames, frame_size] grid: O(N*F), not O((N*F)^2).
  - ``SPConvTranspose2d``       :168-183 — sub-pixel upsample along the frame
    axis.
  - ``DenseBlock``              :186-212 — dilated dense conv stack with
    causal padding along the frame (time) axis.

TPU-first: NHWC layout ``[B, N, F, C]``; the GRU is a ``flax.linen.RNN`` over
a ``lax.scan`` (the one inherently sequential op in the zoo — it runs over
the short frame axes only); everything else is batched matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class PReLU(nn.Module):
    """Per-channel parametric ReLU (torch nn.PReLU semantics)."""

    channels: int = 1
    init: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha", lambda _k: jnp.full((self.channels,), self.init, jnp.float32)
        ).astype(x.dtype)
        return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


class LayerNormLastAxis(nn.Module):
    """torch nn.LayerNorm(d) — normalize + affine over the LAST axis only."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class GRUFeedForward(nn.Module):
    """Bidirectional-GRU feed-forward: GRU(d -> 2d, bidir) -> relu -> dropout
    -> Dense(4d -> d) (reference tstnn.py:63-69, 104-107)."""

    d_model: int
    bidirectional: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # x: [batch, seq, d]
        hidden = self.d_model * 2
        fwd = nn.RNN(nn.GRUCell(features=hidden))
        if self.bidirectional:
            bwd = nn.RNN(nn.GRUCell(features=hidden), reverse=True,
                         keep_order=True)
            out = jnp.concatenate([fwd(x), bwd(x)], axis=-1)  # [b, s, 4d]
        else:
            out = fwd(x)
        out = jax.nn.relu(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return nn.Dense(self.d_model, dtype=x.dtype)(out)


class TransformerEncoderLayerGRU(nn.Module):
    """Post-norm transformer encoder layer with a GRU FFN
    (reference tstnn.py:43-111).  Input [batch, seq, d]."""

    d_model: int
    nhead: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, src: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model, dtype=src.dtype
        )(src, src)
        if self.dropout > 0:
            attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        src = LayerNormLastAxis(self.d_model)(src + attn)
        ff = GRUFeedForward(self.d_model, dropout=self.dropout)(
            src, deterministic
        )
        if self.dropout > 0:
            ff = nn.Dropout(self.dropout, deterministic=deterministic)(ff)
        return LayerNormLastAxis(self.d_model)(src + ff)


class GroupNorm1(nn.Module):
    """torch nn.GroupNorm(1, C): normalize over (H, W, C) jointly with
    per-channel affine."""

    channels: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, H, W, C]
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(x32, axis=(1, 2, 3), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class DualTransformer(nn.Module):
    """Dual-path row/col transformer (reference tstnn.py:114-164).

    Input/output: [B, N, F, C] NHWC.  Row pass: sequences along F (one per
    (b, frame-row)); col pass: sequences along N.
    """

    input_size: int
    output_size: int
    dropout: float = 0.0
    num_layers: int = 1
    # CAUNet's Dual_Transformer variant (CAUNet.py:152-180) differs from
    # TSTNN's in exactly two ways: PReLUs are per-channel (not one shared
    # slope), and the output Sequential is Conv THEN PReLU (TSTNN: PReLU
    # then Conv, tstnn.py:139-141)
    per_channel_prelu: bool = False
    output_conv_first: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, n, f, _c = x.shape
        d = self.input_size // 2
        h = nn.Conv(d, (1, 1), dtype=x.dtype)(x)
        # reference TSTNN uses nn.PReLU() here — ONE shared slope, not
        # per-channel (tstnn.py:122-125, 139-141)
        h = PReLU(d if self.per_channel_prelu else 1)(h)

        for _ in range(self.num_layers):
            # row: sequence along F for each of b*n rows
            row_in = h.reshape(b * n, f, d)
            row_out = TransformerEncoderLayerGRU(
                d, nhead=4, dropout=self.dropout
            )(row_in, deterministic).reshape(b, n, f, d)
            row_out = GroupNorm1(d)(row_out)
            h = h + row_out

            # col: sequence along N for each of b*f cols
            col_in = jnp.swapaxes(h, 1, 2).reshape(b * f, n, d)
            col_out = TransformerEncoderLayerGRU(
                d, nhead=4, dropout=self.dropout
            )(col_in, deterministic).reshape(b, f, n, d)
            col_out = GroupNorm1(d)(jnp.swapaxes(col_out, 1, 2))
            h = h + col_out

        if self.output_conv_first:  # CAUNet.py:174-177
            h = nn.Conv(self.output_size, (1, 1), dtype=x.dtype)(h)
            return PReLU(
                self.output_size if self.per_channel_prelu else 1
            )(h)
        h = PReLU(d if self.per_channel_prelu else 1)(h)
        return nn.Conv(self.output_size, (1, 1), dtype=x.dtype)(h)


class SPConvTranspose2d(nn.Module):
    """Sub-pixel upsample along the frame (W) axis: conv to out*r channels,
    then interleave groups into W (reference tstnn.py:168-183).

    NHWC in/out; kernel runs VALID (the reference pads outside)."""

    out_channels: int
    kernel_size: tuple
    r: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = nn.Conv(
            self.out_channels * self.r, self.kernel_size, padding="VALID",
            dtype=x.dtype,
        )(x)
        b, h, w, _ = out.shape
        # torch view semantics (tstnn.py:176-181): conv channel o = ri*C + c
        # lands at (channel c, width w*r + ri) — the r phases INTERLEAVE along
        # width.  Row-major reshape of (w, r) gives exactly w*r + ri.
        out = out.reshape(b, h, w, self.r, self.out_channels)
        return out.reshape(b, h, w * self.r, self.out_channels)


class DenseBlock(nn.Module):
    """Dilated dense conv stack (reference tstnn.py:186-212).

    Kernel (2, 3) with time-dilation 2^i, causal pad along the frame-index
    (N) axis, SAME-1 pad along the frame-content (F) axis; dense channel
    concatenation; LayerNorm over F; per-channel PReLU.
    """

    input_size: int  # F (for LayerNorm over the last spatial axis)
    depth: int = 5
    in_channels: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, N, F, C]
        skip = x
        out = x
        for i in range(self.depth):
            dil = 2**i
            pad_n = 2 + (dil - 1) * 1 - 1  # causal pad along N
            h = jnp.pad(skip, ((0, 0), (pad_n, 0), (1, 1), (0, 0)))
            h = nn.Conv(
                self.in_channels, (2, 3), kernel_dilation=(dil, 1),
                padding="VALID", dtype=x.dtype,
            )(h)
            # LayerNorm(input_size) normalizes the F axis: move C before F
            h = jnp.swapaxes(h, -1, -2)  # [B, N, C, F]
            h = LayerNormLastAxis(self.input_size)(h)
            h = jnp.swapaxes(h, -1, -2)  # [B, N, F, C]
            out = PReLU(self.in_channels)(h)
            skip = jnp.concatenate([out, skip], axis=-1)
        return out
