"""On-device feature extraction for the spectrogram-conditioned path:
raw audio in, spectrogram computed inside the jitted step."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

import jax
import jax.numpy as jnp
import numpy as np

from sddm_tpu.diffusion import DiffusionSchedule
from sddm_tpu.models import SDDM_spectrogram
from sddm_tpu.models.diffwave import DiffWave
from sddm_tpu.ops.spectrogram import make_feature_fn

HOP = 8
NFFT = 32
T_AUDIO = 128  # 16 frames of hop 8


def build():
    sched = DiffusionSchedule.create("linear", 3, 1e-6, 1e-3)
    net = DiffWave(freq_bins=NFFT // 2 + 1, residual_channels=8,
                   residual_layers=2, dilation_cycle_length=2)
    feature_fn = make_feature_fn("spec", NFFT, HOP)
    model = SDDM_spectrogram(
        sched, net, hop_samples=HOP, noise_condition="time_step",
        feature_fn=feature_fn,
    )
    params = model.init(jax.random.PRNGKey(0), (2, 1, T_AUDIO))
    return model, params


class TestOnDeviceFeatures:
    def test_feature_fn_shapes(self):
        fn = make_feature_fn("spec", NFFT, HOP)
        audio = jnp.zeros((2, 1, T_AUDIO))
        spec = fn(audio)
        assert spec.shape == (2, NFFT // 2 + 1, T_AUDIO // HOP)
        assert np.all(np.isfinite(np.asarray(spec)))

    def test_forward_from_raw_audio(self):
        model, params = build()
        target = jax.random.normal(jax.random.PRNGKey(1), (2, 1, T_AUDIO))
        cond_audio = jax.random.normal(jax.random.PRNGKey(2), (2, 1, T_AUDIO))
        pred, noise = model.forward(
            params, jax.random.PRNGKey(3), target, cond_audio
        )
        assert pred.shape == (2, 1, T_AUDIO)

    def test_infer_from_raw_audio(self):
        model, params = build()
        cond_audio = 0.1 * jax.random.normal(
            jax.random.PRNGKey(4), (2, 1, T_AUDIO)
        )
        out = jax.jit(model.infer)(params, jax.random.PRNGKey(5), cond_audio)
        assert out.shape == (2, 1, T_AUDIO)

    def test_precomputed_spec_still_works(self):
        """feature_fn must not break the precomputed-spectrogram contract."""
        model, params = build()
        spec = jnp.zeros((2, NFFT // 2 + 1, T_AUDIO // HOP))
        audio = jnp.zeros((2, 1, T_AUDIO))
        pred, noise = model.forward(
            params, jax.random.PRNGKey(6), audio, spec
        )
        assert pred.shape == (2, 1, T_AUDIO)

    def test_mel_variant(self):
        fn = make_feature_fn("mel", NFFT, HOP, n_mels=12, sample_rate=16000)
        spec = fn(jnp.ones((1, 1, T_AUDIO)) * 0.1)
        assert spec.shape == (1, 12, T_AUDIO // HOP)
