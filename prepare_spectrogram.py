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


BUCKET = 8192  # pre-padded lengths round up to this; ~6 programs per corpus


def main(path, config, resume=False):
    window_length = config["spectrogram"]["window_length"]
    hop_samples = config["spectrogram"]["hop_samples"]
    n_mels = config["mel_spectrogram"]["n_mels"]
    sample_rate = config["sample_rate"]

    # The reflect (center) padding happens HOST-side so variable-length
    # audio can be zero-padded up to a shared bucket length: frame k reads
    # samples [k*hop, k*hop + n_fft) of the pre-padded array, so trimming
    # the output to the true frame count is elementwise-exact — the zero
    # tail only feeds frames we discard.  One compile per bucket instead of
    # one per unique file length (a 2-4 s corpus previously traced ~2
    # programs per FILE; the CPU client's LLVM JIT dominated wall time).
    spec_fn = jax.jit(
        lambda a: log_compress(
            stft_magnitude(a, window_length, hop_samples, center=False)
        )
    )
    mel_fn = jax.jit(
        lambda a: log_compress(
            mel_spectrogram(a, window_length, hop_samples, n_mels,
                            sample_rate, center=False)
        )
    )

    pad = window_length // 2
    filenames = glob(f"{path}/**/*.wav", recursive=True)
    for i, filename in enumerate(filenames):
        if resume and os.path.exists(f"{filename}.mel.npy") and os.path.exists(
            f"{filename}.spec.npy"
        ):
            continue
        audio, sr = load_wav(filename)
        assert sr == sample_rate, f"{filename}: {sr} != {sample_rate}"
        a = np.asarray(audio, np.float32).reshape(-1)
        n_frames = 1 + (a.shape[0] + 2 * pad - window_length) // hop_samples
        a = np.pad(a, (pad, pad), mode="reflect")
        bucket = -(-a.shape[0] // BUCKET) * BUCKET
        a = jnp.asarray(np.pad(a, (0, bucket - a.shape[0])))
        mel = np.asarray(mel_fn(a))[..., :n_frames]
        spec = np.asarray(spec_fn(a))[..., :n_frames]
        np.save(f"{filename}.mel.npy", np.squeeze(mel))
        np.save(f"{filename}.spec.npy", np.squeeze(spec))
        if (i + 1) % 100 == 0:
            print(f"processed {i + 1}/{len(filenames)}", flush=True)


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
