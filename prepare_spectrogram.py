#!/usr/bin/env python
"""Precompute |STFT| and Mel spectrograms next to each WAV.

Parity: reference prepare_spectrogram.py:13-55 — Hamming-window magnitude
STFT (power 1, window-normalized) and HTK Mel, log10-compressed to [0, 1],
saved as ``<wav>.spec.npy`` / ``<wav>.mel.npy``.

TPU-native: the transforms are the jitted jnp ops from
``sddm_tpu.ops.spectrogram`` — identical math can also run fused in the
on-device input pipeline, making this offline pass optional.
"""

import argparse
import os
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np

from sddm_tpu.data.wav_io import load_wav
from sddm_tpu.ops.spectrogram import log_compress, mel_spectrogram, stft_magnitude
from sddm_tpu.utils import read_json


def main(path, config, resume=False):
    window_length = config["spectrogram"]["window_length"]
    hop_samples = config["spectrogram"]["hop_samples"]
    n_mels = config["mel_spectrogram"]["n_mels"]
    sample_rate = config["sample_rate"]

    spec_fn = jax.jit(
        lambda a: log_compress(stft_magnitude(a, window_length, hop_samples))
    )
    mel_fn = jax.jit(
        lambda a: log_compress(
            mel_spectrogram(a, window_length, hop_samples, n_mels, sample_rate)
        )
    )

    filenames = glob(f"{path}/**/*.wav", recursive=True)
    for i, filename in enumerate(filenames):
        if resume and os.path.exists(f"{filename}.mel.npy") and os.path.exists(
            f"{filename}.spec.npy"
        ):
            continue
        audio, sr = load_wav(filename)
        assert sr == sample_rate, f"{filename}: {sr} != {sample_rate}"
        a = jnp.asarray(audio)
        np.save(f"{filename}.mel.npy", np.squeeze(np.asarray(mel_fn(a))))
        np.save(f"{filename}.spec.npy", np.squeeze(np.asarray(spec_fn(a))))
        if (i + 1) % 100 == 0:
            print(f"processed {i + 1}/{len(filenames)}")
        if (i + 1) % 200 == 0:
            # Variable-length corpora trace one program per unique length;
            # unbounded, the CPU client's LLVM JIT arena eventually fails
            # allocation.  Dropping the caches bounds it (re-jit is cheap
            # relative to one file's IO).
            jax.clear_caches()
            spec_fn = jax.jit(
                lambda a: log_compress(
                    stft_magnitude(a, window_length, hop_samples)
                )
            )
            mel_fn = jax.jit(
                lambda a: log_compress(
                    mel_spectrogram(
                        a, window_length, hop_samples, n_mels, sample_rate
                    )
                )
            )


if __name__ == "__main__":
    from sddm_tpu.cli import setup_platform

    setup_platform()  # honor SDDM_PLATFORM like every other CLI
    parser = argparse.ArgumentParser(description="Precompute spectrograms")
    parser.add_argument("path", type=str, help="data path")
    parser.add_argument("-c", "--config", required=True, type=str)
    parser.add_argument("--resume", action="store_true",
                        help="skip files that already have .spec/.mel outputs")
    args = parser.parse_args()
    main(args.path, read_json(args.config), resume=args.resume)
