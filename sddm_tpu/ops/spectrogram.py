"""On-device STFT / Mel spectrogram features.

Parity: reference prepare_spectrogram.py:13-55, which uses torchaudio
``Spectrogram``/``MelSpectrogram`` with a periodic Hamming window, power=1,
``normalized=True`` (divide by sqrt(sum(window^2))), center=True reflect
padding, HTK mel scale, f_min=20, f_max=sr/2, then log10-compresses to [0,1].

TPU-first: the whole transform is jnp (framed rfft + one matmul for mel), so
feature extraction can run on device fused into the input pipeline instead of
as an offline torch preprocessing pass.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def hamming_window(n: int, periodic: bool = True) -> np.ndarray:
    m = n if periodic else n - 1
    return 0.54 - 0.46 * np.cos(2.0 * np.pi * np.arange(n) / m)


def _frame_for_stft(
    audio: jnp.ndarray, n_fft: int, hop: int, center: bool = True
) -> jnp.ndarray:
    """Center-pad (reflect) then frame; drops any tail remainder like torch.stft.

    ``center=False`` frames the input as-is — for callers that have already
    applied the reflect padding host-side (prepare_spectrogram.py buckets
    pre-padded lengths so variable-length corpora share compiled programs).
    """
    if center:
        pad = n_fft // 2
        padding = [(0, 0)] * (audio.ndim - 1) + [(pad, pad)]
        x = jnp.pad(audio, padding, mode="reflect")
    else:
        x = audio
    n = x.shape[-1]
    n_frames = 1 + (n - n_fft) // hop
    # static-index gather (shapes are static under jit)
    starts = np.arange(n_frames)[:, None] * hop
    idx = starts + np.arange(n_fft)[None, :]
    return x[..., idx]  # [..., n_frames, n_fft]


def stft_magnitude(
    audio: jnp.ndarray,
    n_fft: int,
    hop_samples: int,
    normalized: bool = True,
    center: bool = True,
) -> jnp.ndarray:
    """|STFT| with periodic Hamming window; returns ``[..., freq, time]``.

    Matches torchaudio Spectrogram(power=1, normalized=True) as configured in
    prepare_spectrogram.py:20-25.
    """
    window = hamming_window(n_fft)
    frames = _frame_for_stft(audio, n_fft, hop_samples, center) * jnp.asarray(
        window, audio.dtype
    )
    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1))  # [..., time, freq]
    if normalized:
        spec = spec / np.sqrt((window**2).sum())
    return jnp.swapaxes(spec, -1, -2)  # [..., freq, time]


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 20.0,
    f_max: float | None = None,
) -> np.ndarray:
    """HTK-scale triangular mel filterbank ``[n_freqs, n_mels]`` (torchaudio
    ``melscale_fbanks`` semantics, norm=None)."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    f_pts = _mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return np.maximum(0.0, np.minimum(down, up))


def mel_spectrogram(
    audio: jnp.ndarray,
    n_fft: int,
    hop_samples: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 20.0,
    f_max: float | None = None,
    center: bool = True,
) -> jnp.ndarray:
    """Mel-scale |STFT| ``[..., n_mels, time]`` (prepare_spectrogram.py:27-35)."""
    spec = stft_magnitude(audio, n_fft, hop_samples,
                          center=center)  # [..., freq, time]
    fb = jnp.asarray(
        mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, f_min, f_max),
        spec.dtype,
    )
    return jnp.einsum("...ft,fm->...mt", spec, fb)


def log_compress(spec: jnp.ndarray) -> jnp.ndarray:
    """log10, -1 shift, then (x+5)/5 clamped to [0, 1]
    (prepare_spectrogram.py:43-46, :50-54)."""
    x = jnp.log10(spec) - 1.0
    return jnp.clip((x + 5.0) / 5.0, 0.0, 1.0)


def make_feature_fn(
    kind: str,
    n_fft: int,
    hop_samples: int,
    n_mels: int | None = None,
    sample_rate: int | None = None,
):
    """Build an on-device feature extractor ``[B, 1, T] -> [B, freq, T//hop]``
    for the spectrogram-conditioned models: the full
    prepare_spectrogram.py transform as a pure jnp function that runs fused
    inside the jitted train/sample step (host streams raw waveforms only).

    ``kind``: "spec" (|STFT|) or "mel".  The center-padded STFT yields
    ``1 + T//hop`` frames; the trailing frame is dropped so
    ``frames * hop == T`` (matching the reference Collator's alignment,
    data_loader/numpy_dataset.py:60-77).
    """
    def fn(audio: jnp.ndarray) -> jnp.ndarray:
        a = audio[:, 0, :]
        if kind == "mel":
            spec = mel_spectrogram(
                a, n_fft, hop_samples, n_mels, sample_rate
            )
        else:
            spec = stft_magnitude(a, n_fft, hop_samples)
        spec = log_compress(spec)
        frames = audio.shape[-1] // hop_samples
        return spec[..., :frames]

    return fn
