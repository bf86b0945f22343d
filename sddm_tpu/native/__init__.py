"""Native (C) data-path components, loaded via ctypes.

``libwavio`` is compiled on first import (cached next to the source); every
entry point is pure C with no CPython API, so decode releases the GIL and the
thread-pool loader achieves true parallel IO — the TPU-framework equivalent
of the reference's torchaudio C++ backend.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "wavio.c"
_LIB = _HERE / "libwavio.so"

_lib = None
_load_error: Optional[str] = None


def _build() -> None:
    cmd = ["cc", "-O2", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)]
    subprocess.run(cmd, check=True, capture_output=True)


def _get_lib():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB))
        lib.wav_info.restype = ctypes.c_long
        lib.wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.wav_read_crop_f32.restype = ctypes.c_long
        lib.wav_read_crop_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.wav_write_pcm16.restype = ctypes.c_int
        lib.wav_write_pcm16.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
    except (subprocess.CalledProcessError, OSError) as e:
        _load_error = str(e)
        _lib = None
    return _lib


def available() -> bool:
    return _get_lib() is not None


def wav_info(path) -> Tuple[int, int, int]:
    """Returns (n_frames, sample_rate, channels)."""
    lib = _get_lib()
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    n = lib.wav_info(str(path).encode(), ctypes.byref(sr), ctypes.byref(ch))
    if n < 0:
        raise OSError(f"wav_info failed ({n}) for {path}")
    return int(n), sr.value, ch.value


def load_wav_native(
    path, start: int = 0, length: int = -1
) -> Tuple[np.ndarray, int]:
    """Decode (a crop of) a WAV file -> (float32 [channels, frames], rate).

    ``length < 0`` reads to the end.  Cropped reads seek directly to the
    needed bytes — random training crops never decode the full file.
    """
    lib = _get_lib()
    if lib is None:
        raise OSError(f"libwavio unavailable: {_load_error}")
    n_total, sr0, ch0 = wav_info(path)
    if length < 0 or start + length > n_total:
        length = max(0, n_total - start)
    out = np.empty((ch0, length), dtype=np.float32)
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    got = lib.wav_read_crop_f32(
        str(path).encode(),
        start,
        length,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(sr),
        ctypes.byref(ch),
    )
    if got < 0:
        raise OSError(f"wav decode failed ({got}) for {path}")
    return out[:, :got], sr.value


def save_wav_native(path, audio: np.ndarray, sample_rate: int) -> None:
    """Write planar float32 [channels, frames] (or [frames]) as PCM16."""
    lib = _get_lib()
    if lib is None:
        raise OSError(f"libwavio unavailable: {_load_error}")
    audio = np.ascontiguousarray(np.atleast_2d(audio), dtype=np.float32)
    rc = lib.wav_write_pcm16(
        str(path).encode(),
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        audio.shape[1],
        audio.shape[0],
        sample_rate,
    )
    if rc != 0:
        raise OSError(f"wav encode failed ({rc}) for {path}")
