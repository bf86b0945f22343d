#!/usr/bin/env python
"""Resample a tree of WAV files to the config sample rate.

Parity: reference preprocess.py:10-38 (torchaudio Resample replaced by a
polyphase resampler).
"""

import argparse
from glob import glob
from math import gcd

import numpy as np
from scipy.signal import resample_poly

from sddm_tpu.data.wav_io import load_wav, save_wav
from sddm_tpu.utils import read_json


def main(path, sample_rate):
    filenames = glob(f"{path}/**/*.wav", recursive=True)
    for i, filename in enumerate(filenames):
        audio, sr = load_wav(filename)
        if sr != sample_rate:
            g = gcd(sample_rate, sr)
            audio = resample_poly(
                audio, sample_rate // g, sr // g, axis=-1
            ).astype(np.float32)
        save_wav(filename, audio, sample_rate)
        if (i + 1) % 100 == 0:
            print(f"resampled {i + 1}/{len(filenames)}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Resample dataset wavs")
    parser.add_argument("path", type=str, help="data path")
    parser.add_argument("-c", "--config", default=None, type=str)
    parser.add_argument("--sample_rate", type=int, default=None)
    args = parser.parse_args()
    rate = args.sample_rate
    if rate is None and args.config:
        rate = read_json(args.config)["sample_rate"]
    if rate is None:
        raise SystemExit("provide --sample_rate or -c config with sample_rate")
    main(args.path, rate)
