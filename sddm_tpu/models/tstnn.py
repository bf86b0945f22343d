"""TSTNN — two-stage transformer masking network.

Parity: reference model/tstnn.py:216-299.  Non-diffusion-style: encodes the
framed (condition, x_t) pair, runs a 4-layer dual-path transformer, forms a
gated mask (tanh * sigmoid -> relu(conv)), multiplies it into the encoding,
dense-decodes and overlap-adds.  Receives the noise_level argument but
ignores it, exactly like the reference.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.framing import frame_signal, overlap_add
from .tst_blocks import (
    DenseBlock,
    DualTransformer,
    LayerNormLastAxis,
    PReLU,
    SPConvTranspose2d,
)


class TSTNN(nn.Module):
    num_samples: int
    F: int = 512
    stride: int = 256
    n_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        condition: jnp.ndarray,
        x_t: jnp.ndarray,
        noise_level: jnp.ndarray,  # unused (reference tstnn.py:266 contract)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        in_dtype = x_t.dtype
        F, C = self.F, self.n_channels
        cond_f = frame_signal(condition[:, 0, :], F, self.stride)
        xt_f = frame_signal(x_t[:, 0, :], F, self.stride)
        h = jnp.stack([cond_f, xt_f], axis=-1).astype(self.dtype)  # [B,N,F,2]

        # input block: 1x1 conv -> LayerNorm(F) -> PReLU (tstnn.py:278)
        h = nn.Conv(C, (1, 1), dtype=self.dtype)(h)
        h = _norm_over_F(h, F)
        h = PReLU(C)(h)

        h = DenseBlock(F, 4, C)(h)
        # enc conv: pad (1,1) on F then (1,3) stride (1,2) -> F/2 (tstnn.py:283)
        x1 = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (0, 0)))
        x1 = nn.Conv(C, (1, 3), strides=(1, 2), padding="VALID",
                     dtype=self.dtype)(x1)
        x1 = _norm_over_F(x1, F // 2)
        x1 = PReLU(C)(x1)

        out = DualTransformer(C, C, num_layers=4)(x1, deterministic)

        # gated mask (tstnn.py:287-291)
        gate = jnp.tanh(nn.Conv(C, (1, 1), dtype=self.dtype)(out))
        filt = nn.sigmoid(nn.Conv(C, (1, 1), dtype=self.dtype)(out))
        mask = gate * filt
        mask = nn.relu(nn.Conv(C, (1, 1), dtype=self.dtype)(mask))
        out = x1 * mask

        out = DenseBlock(F // 2, 4, C)(out)
        out = jnp.pad(out, ((0, 0), (0, 0), (1, 1), (0, 0)))
        out = SPConvTranspose2d(C, (1, 3), r=2)(out)
        out = _norm_over_F(out, F)
        out = PReLU(C)(out)

        out = nn.Conv(1, (1, 1), dtype=self.dtype)(out)  # [B, N, F, 1]
        out = jnp.moveaxis(out, -1, 1).astype(in_dtype)  # [B, 1, N, F]
        return overlap_add(out, self.num_samples, self.stride)


def _norm_over_F(h: jnp.ndarray, f: int) -> jnp.ndarray:
    """torch LayerNorm(F) on NCHW == normalize the F axis; in NHWC that is
    axis -2, so swap, normalize last, swap back."""
    h = jnp.swapaxes(h, -1, -2)
    h = LayerNormLastAxis(f)(h)
    return jnp.swapaxes(h, -1, -2)
