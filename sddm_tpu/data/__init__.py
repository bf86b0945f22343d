from .wav_io import load_wav, save_wav
from .datasets import (
    AudioDataset,
    InferDataset,
    NumpyDataset,
    OutputDataset,
    generate_inventory,
)
from .loaders import (
    AudioDataLoader,
    InferDataLoader,
    WaveGradDataLoader,
    DATASETS,
    DATA_LOADERS,
)

__all__ = [
    "load_wav",
    "save_wav",
    "AudioDataset",
    "InferDataset",
    "NumpyDataset",
    "OutputDataset",
    "generate_inventory",
    "AudioDataLoader",
    "InferDataLoader",
    "WaveGradDataLoader",
    "DATASETS",
    "DATA_LOADERS",
]
