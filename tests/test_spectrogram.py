"""On-device STFT/Mel parity vs scipy and shape/value checks
(reference prepare_spectrogram.py transforms)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal as sps

from sddm_tpu.ops.spectrogram import (
    hamming_window,
    log_compress,
    mel_filterbank,
    mel_spectrogram,
    stft_magnitude,
)


class TestSTFT:
    def test_matches_scipy(self):
        n_fft, hop = 256, 64
        x = np.random.RandomState(0).randn(4096).astype(np.float32)
        got = np.asarray(stft_magnitude(jnp.asarray(x), n_fft, hop,
                                        normalized=False))
        # scipy with identical framing: center-pad reflect, periodic hamming
        pad = n_fft // 2
        xp = np.pad(x, (pad, pad), mode="reflect")
        w = hamming_window(n_fft)
        n_frames = 1 + (len(xp) - n_fft) // hop
        ref = np.empty((n_fft // 2 + 1, n_frames))
        for t in range(n_frames):
            fr = xp[t * hop : t * hop + n_fft] * w
            ref[:, t] = np.abs(np.fft.rfft(fr))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)

    def test_normalization(self):
        n_fft, hop = 128, 32
        x = np.random.RandomState(1).randn(1024).astype(np.float32)
        w = hamming_window(n_fft)
        a = np.asarray(stft_magnitude(jnp.asarray(x), n_fft, hop, True))
        b = np.asarray(stft_magnitude(jnp.asarray(x), n_fft, hop, False))
        np.testing.assert_allclose(a * np.sqrt((w**2).sum()), b, rtol=1e-4)

    def test_frame_count_matches_torch_stft(self):
        # torch.stft(center=True): n_frames = 1 + n // hop
        n_fft, hop = 256, 100
        for n in (1000, 1024, 999):
            x = jnp.zeros(n)
            spec = stft_magnitude(x, n_fft, hop)
            assert spec.shape[-1] == 1 + n // hop


class TestMel:
    def test_filterbank_shape_and_coverage(self):
        fb = mel_filterbank(129, 40, 16000)
        assert fb.shape == (129, 40)
        # triangles are non-negative and each band has support
        assert np.all(fb >= 0)
        assert np.all(fb.sum(axis=0) > 0)

    def test_mel_spectrogram_shape(self):
        x = np.random.RandomState(2).randn(2048).astype(np.float32)
        mel = mel_spectrogram(jnp.asarray(x), 256, 64, 40, 16000)
        assert mel.shape == (40, 1 + 2048 // 64)


class TestLogCompress:
    def test_range(self):
        spec = jnp.asarray(np.random.RandomState(3).uniform(1e-6, 20, (10, 10)))
        out = np.asarray(log_compress(spec))
        assert np.all(out >= 0) and np.all(out <= 1)

    def test_known_values(self):
        # log10(10) - 1 = 0 -> (0+5)/5 = 1
        assert float(log_compress(jnp.asarray(10.0))) == pytest.approx(1.0)
        # log10(1e-4) - 1 = -5 -> 0
        assert float(log_compress(jnp.asarray(1e-4))) == pytest.approx(0.0)
