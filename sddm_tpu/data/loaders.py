"""Host-side batch loaders.

Parity: reference base/base_data_loader.py:7-61 (seeded train/val split with
SubsetRandomSampler semantics — np.random.seed(0) shuffle, first ``len_valid``
indices become validation), data_loader/data_loaders.py:93-164
(AudioDataLoader / InferDataLoader with the chunk-concatenating collate) and
data_loader/numpy_dataset.py:55-95 (Collator + WaveGradDataLoader with random
hop-aligned crops and drop-short/drop-last).

TPU-first: instead of forked torch DataLoader workers, a thread pool overlaps
wav decode with device compute (wav decode is IO/numpy-bound and releases the
GIL in numpy); batches are contiguous numpy arrays ready for a single
host->device transfer, optionally sharded across a mesh by the trainer.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import numpy as np


def default_collate(items):
    """Stack each tuple field along a new batch axis."""
    first = items[0]
    if isinstance(first, tuple):
        return tuple(
            np.stack([np.asarray(it[i]) for it in items]) for i in range(len(first))
        )
    return np.stack([np.asarray(it) for it in items])


def infer_data_collate(items):
    """Concatenate pre-stacked chunk rows along the batch axis
    (reference data_loader/data_loaders.py:143-155)."""
    first = items[0]
    return tuple(
        np.concatenate([np.asarray(it[i]) for it in items], axis=0)
        for i in range(len(first))
    )


class BaseDataLoader:
    """Seeded-split batch iterator (reference base/base_data_loader.py:7-61)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        validation_split: float = 0.0,
        num_workers: int = 0,
        collate_fn: Callable = default_collate,
        drop_last: bool = False,
        seed: int = 0,
        _indices: Optional[np.ndarray] = None,
        _epoch_shuffle: Optional[bool] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.collate_fn = collate_fn
        self.drop_last = drop_last
        self.validation_split = validation_split
        self._epoch = 0

        if _indices is not None:
            self.indices = _indices
            self.shuffle = bool(_epoch_shuffle)
            self.valid_indices = None
        elif validation_split == 0.0:
            self.indices = np.arange(len(dataset))
            self.shuffle = shuffle
            self.valid_indices = None
        else:
            n = len(dataset)
            idx_full = np.arange(n)
            # the reference seeds the GLOBAL numpy RNG with 0 for the split
            # (base_data_loader.py:35); we reproduce the same permutation
            np.random.RandomState(0).shuffle(idx_full)
            len_valid = (
                int(validation_split)
                if isinstance(validation_split, int)
                else int(n * validation_split)
            )
            if isinstance(validation_split, int) and not (0 < len_valid < n):
                raise ValueError("validation set size out of range")
            self.valid_indices = idx_full[:len_valid]
            self.indices = idx_full[len_valid:]
            # sampler replaces shuffle (both subsets sample randomly per epoch)
            self.shuffle = True

        self.n_samples = len(self.indices)
        self._rng_seed = seed

    def __len__(self) -> int:
        if self.drop_last:
            return self.n_samples // self.batch_size
        return (self.n_samples + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator:
        order = self.indices
        if self.shuffle:
            rng = np.random.default_rng((self._rng_seed, self._epoch))
            order = rng.permutation(order)
        self._epoch += 1

        n_batches = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]

        if self.num_workers > 1:
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                # pipeline: submit up to 2 batches ahead of consumption.
                # Each fetch decodes its batch's items serially INSIDE one
                # worker (batch-level parallelism): nesting pool.map inside
                # a pool worker deadlocks when num_workers <= the number of
                # outstanding fetches (both workers blocked on inner tasks
                # that can never be scheduled — hit with num_workers=2).
                futures = []
                ahead = 2

                def fetch(batch_idx):
                    items = [self.dataset[i] for i in batch_idx]
                    return self.collate_fn(items)

                for b in batches[:ahead]:
                    futures.append(pool.submit(fetch, b))
                consumed = 0
                while consumed < n_batches:
                    result = futures[consumed].result()
                    nxt = consumed + ahead
                    if nxt < n_batches:
                        futures.append(pool.submit(fetch, batches[nxt]))
                    consumed += 1
                    yield result
        else:
            for b in batches:
                yield self.collate_fn([self.dataset[i] for i in b])

    def split_validation(self) -> Optional["BaseDataLoader"]:
        """Loader over the held-out subset (reference base_data_loader.py:57-61)."""
        if self.valid_indices is None:
            return None
        return BaseDataLoader(
            self.dataset,
            self.batch_size,
            num_workers=self.num_workers,
            collate_fn=self.collate_fn,
            _indices=self.valid_indices,
            _epoch_shuffle=True,
            seed=self._rng_seed + 1,
        )


class AudioDataLoader(BaseDataLoader):
    """Thin wrapper (reference data_loader/data_loaders.py:93-99)."""

    def __init__(self, dataset, batch_size, shuffle=True, validation_split=0.0,
                 num_workers=1, drop_last=False):
        super().__init__(
            dataset, batch_size, shuffle, validation_split, num_workers,
            drop_last=drop_last,
        )


class InferDataLoader(BaseDataLoader):
    """No shuffle; chunk-concatenating collate
    (reference data_loader/data_loaders.py:158-164)."""

    def __init__(self, dataset, batch_size, num_workers=1):
        super().__init__(
            dataset, batch_size, shuffle=False, validation_split=0.0,
            num_workers=num_workers, collate_fn=infer_data_collate,
        )


class _WaveGradCollator:
    """Random crop_mel_frames crop aligned to hop_samples; drops records that
    are too short (reference data_loader/numpy_dataset.py:55-83)."""

    def __init__(self, hop_samples, crop_mel_frames, seed=0):
        self.hop_samples = hop_samples
        self.crop_mel_frames = crop_mel_frames
        self.rng = np.random.default_rng(seed)

    def __call__(self, minibatch):
        audios, specs, indices = [], [], []
        for record in minibatch:
            spec = record["spectrogram"]
            if spec.shape[-1] < self.crop_mel_frames:
                continue
            start = int(
                self.rng.integers(0, spec.shape[-1] - self.crop_mel_frames + 1)
            )
            end = start + self.crop_mel_frames
            specs.append(spec[:, start:end])
            a_start, a_end = start * self.hop_samples, end * self.hop_samples
            audio = record["audio"][:, a_start:a_end]
            pad = (a_end - a_start) - audio.shape[-1]
            if pad > 0:
                audio = np.pad(audio, ((0, 0), (0, pad)))
            audios.append(audio)
            indices.append(record["index"])
        if not audios:
            raise ValueError(
                "all records in batch shorter than crop_mel_frames"
            )
        return (
            np.stack(audios),
            np.stack(specs),
            np.asarray(indices, dtype=np.int64),
        )


class WaveGradDataLoader(BaseDataLoader):
    """Vocoder-path loader: shuffled, drop_last, hop-aligned random crops
    (reference data_loader/numpy_dataset.py:86-95)."""

    def __init__(self, dataset, batch_size, hop_samples, crop_mel_frames,
                 num_workers=1):
        super().__init__(
            dataset, batch_size, shuffle=True, validation_split=0.0,
            num_workers=num_workers,
            collate_fn=_WaveGradCollator(hop_samples, crop_mel_frames),
            drop_last=True,
        )


from .datasets import (  # noqa: E402  (registry assembled after definitions)
    AudioDataset,
    InferDataset,
    NumpyDataset,
    OutputDataset,
)

DATASETS = {
    "AudioDataset": AudioDataset,
    "InferDataset": InferDataset,
    "OutputDataset": OutputDataset,
    "NumpyDataset": NumpyDataset,
}

DATA_LOADERS = {
    "AudioDataLoader": AudioDataLoader,
    "InferDataLoader": InferDataLoader,
    "WaveGradDataLoader": WaveGradDataLoader,
}
