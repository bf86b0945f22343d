"""WAV file IO (host-side).

Replaces the reference's torchaudio.load/save (used throughout data_loader/
and trainer/trainer.py:123-125) with a dependency-light reader/writer:
PCM16/PCM32/float32 WAVs via scipy.io.wavfile, normalized to float32 in
[-1, 1] like torchaudio's default.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np
from scipy.io import wavfile

from .. import native


def load_wav(path) -> Tuple[np.ndarray, int]:
    """Read a WAV file -> (audio [channels, samples] float32 in [-1,1], rate).

    Uses the GIL-free C decoder (sddm_tpu/native/wavio.c) when available;
    scipy fallback otherwise."""
    if native.available():
        return native.load_wav_native(path)
    sr, data = wavfile.read(str(path))
    if data.dtype == np.int16:
        audio = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        audio = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        audio = (data.astype(np.float32) - 128.0) / 128.0
    else:  # float32/float64
        audio = data.astype(np.float32)
    if audio.ndim == 1:
        audio = audio[None, :]
    else:
        audio = audio.T  # scipy gives [samples, channels]
    return audio, int(sr)


def load_wav_i16(path) -> Tuple[np.ndarray, int]:
    """Read a PCM16 WAV without float conversion -> ([channels, samples]
    int16, rate).

    Backing store for the RAM sample cache: int16 halves resident memory vs
    float32 and quarters the per-step host->device transfer vs float32 over
    the accelerator tunnel; the jitted train step dequantizes on device with
    the same /32768 scale as :func:`load_wav`, so values are bit-identical.
    """
    sr, data = wavfile.read(str(path))
    if data.dtype != np.int16:
        raise ValueError(
            f"{path}: RAM cache requires PCM16 WAVs, got {data.dtype}"
        )
    audio = data[None, :] if data.ndim == 1 else data.T
    return np.ascontiguousarray(audio), int(sr)


def load_wav_crop(path, start: int, length: int) -> Tuple[np.ndarray, int]:
    """Read only frames [start, start+length) — the native decoder seeks
    straight to the needed bytes, so random training crops never decode the
    whole utterance."""
    if native.available():
        return native.load_wav_native(path, start, length)
    audio, sr = load_wav(path)
    return audio[:, start : start + length], sr


def wav_num_frames(path) -> int:
    """Frame count without decoding (native header read when available)."""
    if native.available():
        return native.wav_info(path)[0]
    return load_wav(path)[0].shape[-1]


def save_wav(path, audio: np.ndarray, sample_rate: int) -> None:
    """Write float32 [-1,1] audio ([samples], [1, samples] or [channels, samples])
    as PCM16."""
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 2:
        audio = audio.T if audio.shape[0] < audio.shape[1] else audio
        if audio.shape[1] == 1:
            audio = audio[:, 0]
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    wavfile.write(str(path), sample_rate, pcm)
