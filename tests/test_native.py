"""Native C WAV codec: build, correctness vs scipy, crop reads, throughput."""

import numpy as np
import pytest
from scipy.io import wavfile

from sddm_tpu import native
from sddm_tpu.data.wav_io import load_wav, load_wav_crop, save_wav


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("native") / "a.wav"
    rng = np.random.RandomState(0)
    x = rng.uniform(-0.9, 0.9, 12345).astype(np.float32)
    wavfile.write(str(p), 16000, (x * 32767).astype(np.int16))
    return p, x


class TestNative:
    def test_builds(self):
        assert native.available(), "C wavio library failed to build"

    def test_info(self, wav_file):
        p, x = wav_file
        n, sr, ch = native.wav_info(p)
        assert (n, sr, ch) == (12345, 16000, 1)

    def test_decode_matches_scipy(self, wav_file):
        p, x = wav_file
        audio, sr = native.load_wav_native(p)
        assert sr == 16000 and audio.shape == (1, 12345)
        sr2, ref = wavfile.read(str(p))
        np.testing.assert_allclose(
            audio[0], ref.astype(np.float32) / 32768.0, atol=1e-7
        )

    def test_crop_read(self, wav_file):
        p, x = wav_file
        full, _ = native.load_wav_native(p)
        crop, sr = native.load_wav_native(p, start=1000, length=256)
        assert crop.shape == (1, 256)
        np.testing.assert_array_equal(crop, full[:, 1000:1256])

    def test_crop_past_end(self, wav_file):
        p, _ = wav_file
        crop, _ = native.load_wav_native(p, start=12345 - 10, length=256)
        assert crop.shape == (1, 10)

    def test_float32_wav(self, tmp_path):
        p = tmp_path / "f32.wav"
        x = np.random.RandomState(1).uniform(-1, 1, 500).astype(np.float32)
        wavfile.write(str(p), 8000, x)  # scipy writes IEEE float format
        audio, sr = native.load_wav_native(p)
        assert sr == 8000
        np.testing.assert_allclose(audio[0], x, atol=1e-7)

    def test_stereo(self, tmp_path):
        p = tmp_path / "st.wav"
        x = np.random.RandomState(2).uniform(-1, 1, (300, 2)).astype(np.float32)
        wavfile.write(str(p), 8000, (x * 32767).astype(np.int16))
        audio, sr = native.load_wav_native(p)
        assert audio.shape == (2, 300)  # planar channel-major
        np.testing.assert_allclose(audio[0], x[:, 0], atol=1e-4)
        np.testing.assert_allclose(audio[1], x[:, 1], atol=1e-4)

    def test_native_encode_round_trip(self, tmp_path):
        p = tmp_path / "enc.wav"
        x = np.random.RandomState(3).uniform(-0.9, 0.9, 700).astype(np.float32)
        native.save_wav_native(p, x, 16000)
        audio, sr = native.load_wav_native(p)
        assert sr == 16000
        np.testing.assert_allclose(audio[0], x, atol=1e-4)


class TestWavIOIntegration:
    def test_load_wav_uses_native(self, wav_file):
        p, x = wav_file
        audio, sr = load_wav(p)
        assert sr == 16000 and audio.shape == (1, 12345)

    def test_load_wav_crop(self, wav_file):
        p, _ = wav_file
        full, _ = load_wav(p)
        crop, _ = load_wav_crop(p, 500, 100)
        np.testing.assert_array_equal(crop, full[:, 500:600])

    def test_dataset_crop_pushdown(self, tmp_path):
        from sddm_tpu.data import AudioDataset

        for sub in ("clean", "noisy"):
            (tmp_path / sub).mkdir()
        rng = np.random.RandomState(4)
        for i in range(3):
            x = rng.uniform(-0.5, 0.5, 3000).astype(np.float32)
            save_wav(tmp_path / "clean" / f"u{i}.wav", x, 16000)
            save_wav(tmp_path / "noisy" / f"u{i}.wav", x, 16000)
        ds = AudioDataset(tmp_path, ".wav", sample_rate=16000, T=512)
        clean, noisy, idx = ds[0]
        assert clean.shape == (1, 512)
        np.testing.assert_allclose(clean, noisy)  # same crop window
