"""RAM-cached int16 data path: bit-identical to the float32 decode path.

The cache stores raw PCM16 (wav_io.load_wav_i16) and the trainer dequantizes
on device with the same /32768 scale as wav_io.load_wav, so training on
cached-int16 batches must match float32 training exactly while moving 4x
fewer bytes per step.
"""

import numpy as np
import pytest

from sddm_tpu.data.datasets import AudioDataset
from sddm_tpu.data.wav_io import load_wav, load_wav_i16, save_wav


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("ramcache")
    rng = np.random.default_rng(0)
    for sub in ("clean", "noisy"):
        (root / sub).mkdir()
    for i in range(4):
        n = 4000 + 137 * i
        clean = (rng.standard_normal(n) * 0.1).astype(np.float32)
        noisy = clean + (rng.standard_normal(n) * 0.05).astype(np.float32)
        save_wav(root / "clean" / f"u{i}.wav", clean, 16000)
        save_wav(root / "noisy" / f"u{i}.wav", noisy, 16000)
    return root


def test_load_wav_i16_matches_load_wav(corpus):
    path = corpus / "clean" / "u0.wav"
    f32, sr1 = load_wav(path)
    i16, sr2 = load_wav_i16(path)
    assert sr1 == sr2 and i16.dtype == np.int16
    np.testing.assert_array_equal(i16.astype(np.float32) / 32768.0, f32)


@pytest.mark.parametrize("T", [2048, 8192])  # crop and pad regimes
def test_cached_crops_bit_identical(corpus, T):
    plain = AudioDataset(corpus, ".wav", sample_rate=16000, T=T, seed=7)
    cached = AudioDataset(
        corpus, ".wav", sample_rate=16000, T=T, seed=7, cache="ram"
    )
    for idx in range(len(plain)):
        c0, n0, i0 = plain[idx]
        c1, n1, i1 = cached[idx]
        assert i0 == i1 and c1.dtype == np.int16 and n1.dtype == np.int16
        np.testing.assert_array_equal(c1.astype(np.float32) / 32768.0, c0)
        np.testing.assert_array_equal(n1.astype(np.float32) / 32768.0, n0)
    # second epoch reads come from the cache dict, same RNG stream
    assert len(cached._cache_store) == len(plain)


def test_cache_requires_pcm16(tmp_path):
    from scipy.io import wavfile

    (tmp_path / "clean").mkdir()
    (tmp_path / "noisy").mkdir()
    data = np.zeros(1000, dtype=np.float32)
    for sub in ("clean", "noisy"):
        wavfile.write(str(tmp_path / sub / "u.wav"), 16000, data)
    ds = AudioDataset(tmp_path, ".wav", sample_rate=16000, T=512, cache="ram")
    with pytest.raises(ValueError, match="PCM16"):
        ds[0]


def test_train_step_dequant_exact(corpus):
    """One jitted train step on int16 batches == the same step on f32."""
    import jax
    import jax.numpy as jnp

    from sddm_tpu.train.trainer import Trainer

    rng = np.random.default_rng(1)
    tgt_i16 = rng.integers(-32768, 32767, size=(2, 1, 256), dtype=np.int16)
    tgt_f32 = tgt_i16.astype(np.float32) / 32768.0
    a = Trainer._dequant(jnp.asarray(tgt_i16))
    b = Trainer._dequant(jnp.asarray(tgt_f32))
    assert a.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
