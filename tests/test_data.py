"""Data pipeline tests: wav IO, datasets, loaders, split sampler semantics
(reference data_loader/ + base/base_data_loader.py)."""

import numpy as np
import pytest

from sddm_tpu.data import (
    AudioDataLoader,
    AudioDataset,
    InferDataLoader,
    InferDataset,
    NumpyDataset,
    WaveGradDataLoader,
    load_wav,
    save_wav,
)


@pytest.fixture(scope="module")
def wav_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.RandomState(0)
    for sub in ("clean", "noisy"):
        (root / sub).mkdir()
    for i in range(6):
        n = 4000 + i * 500
        clean = rng.uniform(-0.5, 0.5, n).astype(np.float32)
        noisy = clean + rng.uniform(-0.1, 0.1, n).astype(np.float32)
        save_wav(root / "clean" / f"p{i}.wav", clean, 16000)
        save_wav(root / "noisy" / f"p{i}.wav", noisy, 16000)
    return root


class TestWavIO:
    def test_round_trip(self, tmp_path):
        x = np.random.RandomState(1).uniform(-0.9, 0.9, 1000).astype(np.float32)
        save_wav(tmp_path / "a.wav", x, 16000)
        y, sr = load_wav(tmp_path / "a.wav")
        assert sr == 16000 and y.shape == (1, 1000)
        np.testing.assert_allclose(y[0], x, atol=1e-4)  # PCM16 quantization


class TestAudioDataset:
    def test_crop(self, wav_root):
        ds = AudioDataset(wav_root, ".wav", sample_rate=16000, T=1024)
        clean, noisy, idx = ds[0]
        assert clean.shape == (1, 1024) and noisy.shape == (1, 1024)

    def test_pad(self, wav_root):
        ds = AudioDataset(wav_root, ".wav", sample_rate=16000, T=10000)
        clean, noisy, idx = ds[0]
        assert clean.shape == (1, 10000)
        assert np.all(clean[:, 4000:] == 0)

    def test_rate_mismatch(self, wav_root):
        ds = AudioDataset(wav_root, ".wav", sample_rate=8000, T=-1)
        with pytest.raises(ValueError):
            ds[0]

    def test_get_name(self, wav_root):
        ds = AudioDataset(wav_root, ".wav", sample_rate=16000)
        assert ds.get_name(0) == "p0"


class TestInferDataset:
    def test_chunking(self, wav_root):
        T = 1500
        ds = InferDataset(wav_root, ".wav", sample_rate=16000, T=T)
        clean, noisy, idx = ds[0]  # 4000 samples -> 3 chunks
        assert clean.shape == (3, 1, T)
        assert np.all(idx == 0)
        # reassembled chunks equal padded original
        orig, _ = load_wav(wav_root / "clean" / "p0.wav")
        flat = clean.reshape(-1)[: orig.shape[-1]]
        np.testing.assert_allclose(flat, orig[0], atol=1e-6)


class TestLoaders:
    def test_audio_loader_batches(self, wav_root):
        ds = AudioDataset(wav_root, ".wav", sample_rate=16000, T=1024)
        dl = AudioDataLoader(ds, batch_size=2, shuffle=True, num_workers=1)
        batches = list(dl)
        assert len(batches) == 3
        t, c, i = batches[0]
        assert t.shape == (2, 1, 1024)

    def test_split_sampler(self, wav_root):
        ds = AudioDataset(wav_root, ".wav", sample_rate=16000, T=1024)
        dl = AudioDataLoader(ds, batch_size=2, validation_split=2, num_workers=1)
        val = dl.split_validation()
        assert dl.n_samples == 4 and val.n_samples == 2
        # the split must be reproducible (seeded with 0, like the reference)
        dl2 = AudioDataLoader(ds, batch_size=2, validation_split=2)
        np.testing.assert_array_equal(
            np.sort(dl.indices), np.sort(dl2.indices)
        )
        # train and valid are disjoint
        assert not set(dl.indices) & set(val.indices)

    def test_infer_loader_collate(self, wav_root):
        ds = InferDataset(wav_root, ".wav", sample_rate=16000, T=1500)
        dl = InferDataLoader(ds, batch_size=2, num_workers=1)
        clean, noisy, idx = next(iter(dl))
        # file 0: 4000 -> 3 chunks; file 1: 4500 -> 3 chunks
        assert clean.shape[0] == 6 and clean.shape[1:] == (1, 1500)
        assert set(np.unique(idx)) == {0, 1}

    def test_threaded_loader_matches(self, wav_root):
        ds = AudioDataset(wav_root, ".wav", sample_rate=16000, T=-1)
        a = list(AudioDataLoader(ds, batch_size=1, shuffle=False, num_workers=1))
        b = list(AudioDataLoader(ds, batch_size=1, shuffle=False, num_workers=4))
        for (t1, c1, i1), (t2, c2, i2) in zip(a, b):
            np.testing.assert_array_equal(t1, t2)
            np.testing.assert_array_equal(i1, i2)

    def test_two_workers_no_deadlock(self, wav_root):
        """Regression: num_workers=2 used to deadlock — both pool workers
        were occupied by batch-fetch bodies whose nested pool.map item tasks
        could then never be scheduled (hit by every shipped config with
        num_workers: 2)."""
        import threading

        ds = AudioDataset(wav_root, ".wav", sample_rate=16000, T=1024)
        dl = AudioDataLoader(ds, batch_size=2, shuffle=False, num_workers=2)
        out = []
        t = threading.Thread(target=lambda: out.extend(dl), daemon=True)
        t.start()
        t.join(timeout=60)
        assert not t.is_alive(), "threaded loader deadlocked"
        assert len(out) == len(dl)


class TestWaveGradLoader:
    def test_crop_alignment(self, wav_root, tmp_path_factory):
        # synthesize spectrograms next to the wavs
        hop, frames = 64, 16
        for name in ["p%d.wav" % i for i in range(6)]:
            audio, _ = load_wav(wav_root / "clean" / name)
            n_frames = audio.shape[-1] // hop
            spec = np.random.RandomState(0).rand(33, n_frames).astype(np.float32)
            np.save(wav_root / "noisy" / f"{name}.spec.npy", spec)
        ds = NumpyDataset(wav_root, ".spec.npy", sample_rate=16000)
        dl = WaveGradDataLoader(
            ds, batch_size=2, hop_samples=hop, crop_mel_frames=frames,
            num_workers=1,
        )
        audio, spec, idx = next(iter(dl))
        assert spec.shape == (2, 33, frames)
        assert audio.shape == (2, 1, frames * hop)
