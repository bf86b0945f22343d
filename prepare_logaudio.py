#!/usr/bin/env python
"""Precompute log-modulus-companded waveforms next to each WAV.

Parity: reference prepare_logaudio.py:29-49 — saves ``<wav>.logwav.npy``
using the sign(x)*log10(|10^3 x| + 1)/(2*3) companding; the inverse lives in
``sddm_tpu.ops.logaudio`` and is applied by infer.py when undoing.
"""

import argparse
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np

from sddm_tpu.data.wav_io import load_wav
from sddm_tpu.ops.logaudio import log_modulus_normalize
from sddm_tpu.utils import read_json

EXPAND_ORDER = 3


def main(path, sample_rate):
    fn = jax.jit(lambda a: log_modulus_normalize(a, EXPAND_ORDER))
    filenames = glob(f"{path}/**/*.wav", recursive=True)
    for i, filename in enumerate(filenames):
        audio, sr = load_wav(filename)
        assert sr == sample_rate, f"{filename}: {sr} != {sample_rate}"
        logwav = np.asarray(fn(jnp.asarray(audio)))
        if np.max(logwav) > 1 or np.min(logwav) < -1:
            print(f"min: {logwav.min()}, max: {logwav.max()}")
        np.save(f"{filename}.logwav.npy", logwav)
        if (i + 1) % 100 == 0:
            print(f"processed {i + 1}/{len(filenames)}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Log-modulus companding")
    parser.add_argument("path", type=str, help="data path")
    parser.add_argument("-c", "--config", default=None, type=str)
    parser.add_argument("--sample_rate", type=int, default=None)
    args = parser.parse_args()
    rate = args.sample_rate or (
        read_json(args.config)["sample_rate"] if args.config else 16000
    )
    main(args.path, rate)
