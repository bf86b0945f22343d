#!/usr/bin/env python
"""CPU-backend spectrogram prep, reverse file order, atomic writes.

Companion to prepare_spectrogram.py for relay-wedge windows: the chip
job (forward order, --resume) and this CPU job (reverse order) cooperate
through the filesystem — each skips files whose outputs already exist —
and meet in the middle.  Writes are tmp+rename so a half-written .npy
can never be observed.

Usage: python tools/spec_prep_cpu.py <data_dir> -c <config.json>
"""

import argparse
import json
import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from sddm_tpu.data import load_wav
from sddm_tpu.ops.spectrogram import (
    log_compress,
    mel_spectrogram,
    stft_magnitude,
)

BUCKET = 8192


def atomic_save(path, arr):
    tmp = f"{path}.tmp{os.getpid()}"  # np.save appends .npy
    np.save(tmp, arr)
    os.replace(f"{tmp}.npy", path)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path")
    ap.add_argument("-c", "--config", required=True)
    ns = ap.parse_args()
    config = json.load(open(ns.config))

    window_length = config["spectrogram"]["window_length"]
    hop_samples = config["spectrogram"]["hop_samples"]
    n_mels = config["mel_spectrogram"]["n_mels"]
    sample_rate = config["sample_rate"]

    spec_fn = jax.jit(lambda a: log_compress(
        stft_magnitude(a, window_length, hop_samples, center=False)))
    mel_fn = jax.jit(lambda a: log_compress(
        mel_spectrogram(a, window_length, hop_samples, n_mels,
                        sample_rate, center=False)))

    pad = window_length // 2
    filenames = sorted(glob(f"{ns.path}/**/*.wav", recursive=True),
                       reverse=True)
    done = 0
    for i, filename in enumerate(filenames):
        if os.path.exists(f"{filename}.mel.npy") and os.path.exists(
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
        atomic_save(f"{filename}.mel.npy", np.squeeze(mel))
        atomic_save(f"{filename}.spec.npy", np.squeeze(spec))
        done += 1
        if done % 100 == 0:
            print(f"cpu: wrote {done} ({i + 1}/{len(filenames)} scanned)",
                  flush=True)
    print(f"cpu: done, wrote {done}", flush=True)


if __name__ == "__main__":
    main()
