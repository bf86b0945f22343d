"""Host-side datasets.

Parity: reference data_loader/data_loaders.py:13-196 (AudioDataset /
InferDataset / OutputDataset / generate_inventory) and
data_loader/numpy_dataset.py:15-52 (NumpyDataset).  Pure numpy on the host —
batches are handed to jitted device functions by the loaders; feature
transforms (.logwav/.spec/.mel) may also be computed on device via
``sddm_tpu.ops`` instead of loaded from precomputed ``.npy`` files.
"""

from __future__ import annotations

from math import ceil
from pathlib import Path
from typing import List, Tuple

import numpy as np

from .wav_io import load_wav, load_wav_crop, load_wav_i16, wav_num_frames

_DATATYPES = (".wav", ".logwav.npy", ".spec.npy", ".mel.npy")


def generate_inventory(path, file_type: str = ".wav") -> List[str]:
    """List file names of ``file_type`` in ``path``
    (reference data_loader/data_loaders.py:13-20)."""
    path = Path(path)
    if not path.is_dir():
        raise NotADirectoryError(f"{path} is not a valid directory")
    names = sorted(p.name for p in path.glob("*" + file_type))
    if not names:
        raise FileNotFoundError(f"{path} has no valid {file_type} file")
    return names


class AudioDataset:
    """Paired clean/noisy utterances with random T-sample crop or zero pad
    (reference data_loader/data_loaders.py:23-90).

    ``rng`` drives the random crop; per-epoch reseeding lives in the loader.
    """

    def __init__(self, data_root, datatype, sample_rate=8000, T=-1, seed=0,
                 cache=None):
        if datatype not in _DATATYPES:
            raise NotImplementedError(datatype)
        if cache not in (None, "ram"):
            raise ValueError(f"cache must be None or 'ram', got {cache!r}")
        if cache == "ram" and datatype != ".wav":
            raise ValueError("cache='ram' is only supported for .wav data")
        self.datatype = datatype
        self.sample_rate = sample_rate
        self.T = T
        self.clean_path = Path(f"{data_root}/clean")
        self.noisy_path = Path(f"{data_root}/noisy")
        self.inventory = generate_inventory(self.clean_path, datatype)
        self.data_len = len(self.inventory)
        self.rng = np.random.default_rng(seed)
        # RAM cache: decoded int16 PCM per file pair, filled lazily on first
        # touch (first epoch pays the decode, later epochs crop from memory
        # and batches leave the host as int16 — 4x fewer tunnel bytes than
        # float32; the train step dequantizes on device, bit-identically)
        self.cache = cache
        self._cache_store = {} if cache else None

    def _cached_pair_i16(self, index):
        hit = self._cache_store.get(index)
        if hit is None:
            name = self.inventory[index]
            clean, sr1 = load_wav_i16(self.clean_path / name)
            noisy, sr2 = load_wav_i16(self.noisy_path / name)
            for sr in (sr1, sr2):
                if sr != self.sample_rate:
                    raise ValueError(f"{name}: rate {sr} != {self.sample_rate}")
            if noisy.shape[-1] != clean.shape[-1]:
                raise ValueError("clean/noisy length mismatch")
            hit = (clean, noisy)
            self._cache_store[index] = hit  # dict set is atomic under the GIL
        return hit

    def __len__(self):
        return self.data_len

    def _load_pair(self, index) -> Tuple[np.ndarray, np.ndarray]:
        name = self.inventory[index]
        if self.datatype == ".wav":
            clean, sr = load_wav(self.clean_path / name)
            if sr != self.sample_rate:
                raise ValueError(f"{name}: rate {sr} != {self.sample_rate}")
            noisy, sr = load_wav(self.noisy_path / name)
            if sr != self.sample_rate:
                raise ValueError(f"{name}: rate {sr} != {self.sample_rate}")
        else:
            clean = np.load(self.clean_path / name)
            noisy = np.load(self.noisy_path / name)
            if clean.ndim == 1:
                clean, noisy = clean[None, :], noisy[None, :]
        return clean.astype(np.float32), noisy.astype(np.float32)

    def __getitem__(self, index):
        if self.cache == "ram":
            clean, noisy = self._cached_pair_i16(index)
            n = clean.shape[-1]
            if n > self.T > 0:
                start = int(self.rng.integers(0, n - self.T))
                clean = clean[:, start : start + self.T]
                noisy = noisy[:, start : start + self.T]
            elif self.T > n > 0:
                pad = self.T - n
                clean = np.pad(clean, ((0, 0), (0, pad)))
                noisy = np.pad(noisy, ((0, 0), (0, pad)))
            return np.ascontiguousarray(clean), np.ascontiguousarray(noisy), index

        if self.datatype == ".wav" and self.T > 0:
            # crop pushdown: read the header, pick the crop window, decode
            # only those bytes (native decoder seeks; scipy fallback slices)
            name = self.inventory[index]
            n = wav_num_frames(self.clean_path / name)
            if n > self.T:
                start = int(self.rng.integers(0, n - self.T))
                clean, sr1 = load_wav_crop(
                    self.clean_path / name, start, self.T
                )
                noisy, sr2 = load_wav_crop(
                    self.noisy_path / name, start, self.T
                )
                for sr in (sr1, sr2):
                    if sr != self.sample_rate:
                        raise ValueError(
                            f"{name}: rate {sr} != {self.sample_rate}"
                        )
                if noisy.shape[-1] != clean.shape[-1]:
                    raise ValueError("clean/noisy length mismatch")
                return (
                    clean.astype(np.float32),
                    noisy.astype(np.float32),
                    index,
                )

        clean, noisy = self._load_pair(index)
        if self.datatype in (".wav", ".logwav.npy"):
            n = clean.shape[-1]
            if n != noisy.shape[-1]:
                raise ValueError("clean/noisy length mismatch")
            if n > self.T > 0:
                start = int(self.rng.integers(0, n - self.T))
                clean = clean[:, start : start + self.T]
                noisy = noisy[:, start : start + self.T]
            elif self.T > n > 0:
                pad = self.T - n
                clean = np.pad(clean, ((0, 0), (0, pad)))
                noisy = np.pad(noisy, ((0, 0), (0, pad)))
        return clean, noisy, index

    def get_name(self, idx) -> str:
        if self.datatype == ".wav":
            return self.inventory[idx].rsplit(".", 1)[0]
        return self.inventory[idx].rsplit(".", 2)[0]

    # reference-API alias (data_loader/data_loaders.py:84)
    getName = get_name


class InferDataset(AudioDataset):
    """Pad each utterance to a multiple of T and stack chunks as batch rows
    ``[n_chunk, 1, T]`` with per-chunk file indices
    (reference data_loader/data_loaders.py:101-141)."""

    def __getitem__(self, index):
        if self.datatype not in (".wav", ".logwav.npy"):
            raise NotImplementedError(self.datatype)
        clean, noisy = self._load_pair(index)
        n = clean.shape[-1]
        if n != noisy.shape[-1]:
            raise ValueError("clean/noisy length mismatch")
        n_chunk = ceil(n / self.T)
        pad = n_chunk * self.T - n
        clean = np.pad(clean, ((0, 0), (0, pad)))
        noisy = np.pad(noisy, ((0, 0), (0, pad)))
        clean_stacked = clean.reshape(n_chunk, 1, self.T)
        noisy_stacked = noisy.reshape(n_chunk, 1, self.T)
        index_arr = index * np.ones(n_chunk, dtype=np.int64)
        return clean_stacked, noisy_stacked, index_arr


class OutputDataset:
    """Read target/condition/output triplets from a results dir
    (reference data_loader/data_loaders.py:167-196)."""

    def __init__(self, data_root, datatype, sample_rate=8000, T=-1):
        if datatype not in (".wav",):
            raise NotImplementedError(datatype)
        self.datatype = datatype
        self.sample_rate = sample_rate
        self.clean_path = Path(f"{data_root}/target")
        self.noisy_path = Path(f"{data_root}/condition")
        self.output_path = Path(f"{data_root}/output")
        self.inventory = sorted(generate_inventory(self.output_path, datatype))
        self.data_len = len(self.inventory)

    def __len__(self):
        return self.data_len

    def __getitem__(self, index):
        name = self.inventory[index]
        clean, sr = load_wav(self.clean_path / name)
        if sr != self.sample_rate:
            raise ValueError(f"{name}: rate {sr} != {self.sample_rate}")
        noisy, sr = load_wav(self.noisy_path / name)
        if sr != self.sample_rate:
            raise ValueError(f"{name}: rate {sr} != {self.sample_rate}")
        output, sr = load_wav(self.output_path / name)
        if sr != self.sample_rate:
            raise ValueError(f"{name}: rate {sr} != {self.sample_rate}")
        return clean, noisy, output

    def get_name(self, idx) -> str:
        return self.inventory[idx].rsplit(".", 1)[0]

    getName = get_name


class NumpyDataset:
    """Clean audio + noisy spectrogram records for the vocoder path
    (reference data_loader/numpy_dataset.py:15-52)."""

    def __init__(self, data_root, datatype, sample_rate=8000, T=-1):
        if datatype not in (".wav", ".spec.npy", ".mel.npy"):
            raise NotImplementedError(datatype)
        self.datatype = datatype
        self.sample_rate = sample_rate
        self.T = T
        self.clean_path = Path(f"{data_root}/clean")
        self.noisy_path = Path(f"{data_root}/noisy")
        self.inventory = generate_inventory(self.clean_path, ".wav")
        self.data_len = len(self.inventory)

    def __len__(self):
        return self.data_len

    def __getitem__(self, idx):
        name = self.inventory[idx]
        audio, _sr = load_wav(self.clean_path / name)
        record = {"audio": audio.astype(np.float32), "index": idx}
        if self.datatype in (".spec.npy", ".mel.npy"):
            record["spectrogram"] = np.load(
                self.noisy_path / f"{name}{self.datatype}"
            ).astype(np.float32)
        return record

    def get_name(self, idx) -> str:
        return self.inventory[idx].split(".", 1)[0]

    getName = get_name
