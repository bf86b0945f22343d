"""Signal framing and overlap-add, TPU-style.

Behavioral parity targets:
  - ``SignalToFrames`` (reference model/UNetModified2.py:5-41): frame a
    ``[B, 1, n_samples]`` signal into ``[B, 1, n_frames, F]`` windows at a
    fixed stride, and the inverse overlap-add.
  - ``Segmentor`` (reference model/segmentor.py:33-84): same framing but with
    triangular cross-fade weights applied per segment.

TPU-first design: the reference gathers through a ``[n_frames, F]`` index
matrix and does an in-place scatter-add python loop for overlap-add.  Under
XLA we avoid gather/scatter entirely when ``F % stride == 0`` (true for every
shipped config: F=128, stride=64): the signal is reshaped into ``[N+k-1,
stride]`` panes (k = F // stride) and frames are k statically-shifted slices
concatenated on the last axis; overlap-add is the transpose — k static
slice-adds.  Both lower to pure reshapes/adds that XLA fuses; the VJP of
overlap-add is exactly frame_signal (and vice versa), so training through
these ops is gather-free too.  A static-index gather/scatter fallback covers
the general stride case.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _check_geometry(n_samples: int, frame_len: int, stride: int) -> int:
    if (n_samples - frame_len) % stride != 0:
        raise ValueError(
            f"(n_samples - frame_len) must be divisible by stride; got "
            f"n_samples={n_samples}, frame_len={frame_len}, stride={stride}"
        )
    return (n_samples - frame_len) // stride + 1


def frame_signal(sig: jnp.ndarray, frame_len: int, stride: int) -> jnp.ndarray:
    """Frame ``[..., n_samples]`` into ``[..., n_frames, frame_len]``.

    Parity: ``SignalToFrames.forward`` (model/UNetModified2.py:23-28).
    """
    n_samples = sig.shape[-1]
    n_frames = _check_geometry(n_samples, frame_len, stride)
    if frame_len % stride == 0:
        k = frame_len // stride
        panes = sig.reshape(sig.shape[:-1] + (n_frames + k - 1, stride))
        parts = [panes[..., j : j + n_frames, :] for j in range(k)]
        return jnp.concatenate(parts, axis=-1)
    # general case: static-index gather
    idx = _index_matrix(n_frames, frame_len, stride)
    return sig[..., idx]


def overlap_add(
    frames: jnp.ndarray, n_samples: int, stride: int
) -> jnp.ndarray:
    """Inverse of :func:`frame_signal`: ``[..., n_frames, F] -> [..., n_samples]``.

    Overlapping regions are summed (no normalization), matching
    ``SignalToFrames.overlapAdd`` (model/UNetModified2.py:30-41).
    """
    frame_len = frames.shape[-1]
    n_frames = frames.shape[-2]
    expect = _check_geometry(n_samples, frame_len, stride)
    if expect != n_frames:
        raise ValueError(f"expected {expect} frames, got {n_frames}")
    if frame_len % stride == 0:
        k = frame_len // stride
        sub = frames.reshape(frames.shape[:-1] + (k, stride))
        out = jnp.zeros(frames.shape[:-2] + (n_frames + k - 1, stride), frames.dtype)
        for j in range(k):
            out = out.at[..., j : j + n_frames, :].add(sub[..., j, :])
        return out.reshape(frames.shape[:-2] + (n_samples,))
    idx = _index_matrix(n_frames, frame_len, stride)
    out = jnp.zeros(frames.shape[:-2] + (n_samples,), frames.dtype)
    return out.at[..., idx].add(frames)


def _index_matrix(n_frames: int, frame_len: int, stride: int) -> np.ndarray:
    starts = np.arange(n_frames)[:, None] * stride
    return starts + np.arange(frame_len)[None, :]


class Framer:
    """Static-geometry framing helper (drop-in for reference SignalToFrames)."""

    def __init__(self, n_samples: int, frame_len: int = 512, stride: int = 256):
        self.n_samples = n_samples
        self.frame_len = frame_len
        self.stride = stride
        self.n_frames = _check_geometry(n_samples, frame_len, stride)

    def __call__(self, sig: jnp.ndarray) -> jnp.ndarray:
        return frame_signal(sig, self.frame_len, self.stride)

    def overlap_add(self, frames: jnp.ndarray) -> jnp.ndarray:
        return overlap_add(frames, self.n_samples, self.stride)


class Segmentor(Framer):
    """Framing with triangular cross-fade weights.

    Parity: reference ``Segmentor`` (model/segmentor.py:33-84).  The first
    segment gets only the down-ramp on its second half; every other segment
    (including the last — the reference's ``elif i == n_segments`` branch is
    unreachable, see SURVEY.md §7 quirks) gets both up- and down-ramps.
    Weights are built once on host and closed over as a constant.
    """

    def __init__(self, num_samples: int, F: int = 512, stride: int = 256):
        super().__init__(num_samples, F, stride)
        half = F // 2
        down = np.linspace(1.0, 0.0, half, dtype=np.float32)
        up = np.linspace(0.0, 1.0, half, dtype=np.float32)
        w = np.ones((self.n_frames, F), dtype=np.float32)
        w[0, half:] = down
        w[1:, :half] = up
        w[1:, half:] = down
        self.weight_mat = jnp.asarray(w)

    def __call__(self, sig: jnp.ndarray) -> jnp.ndarray:
        return self.weight_mat * frame_signal(sig, self.frame_len, self.stride)
