"""Golden-shape tests for the denoiser zoo (SURVEY.md §4 test strategy —
every network honors the shared call contract
``network(condition, x_t, noise_level) -> eps_hat``)."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sddm_tpu.models import (
    DenoiseWaveGrad1,
    DenoiseWaveGrad2,
    DenoiseWaveGrad3,
    DiffWave,
    SNREstimator,
    TSTNN,
    UNetModified,
    UNetModified2_VariableNoiseLevel,
    WaveGrad,
)


def _run(net, condition, x_t, nl):
    params = net.init(jax.random.PRNGKey(0), condition, x_t, nl)
    out = net.apply(params, condition, x_t, nl)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    return out, n_params


class TestUNetModified:
    def test_shape(self):
        # 3 levels, attn at level 2; frames 16x16
        n = (16 - 1) * 8 + 16  # 136 samples -> 16 frames of 16
        net = UNetModified(
            num_samples=n, inner_channel=8, norm_groups=4,
            channel_mults=(1, 2, 4), attn_layer=(2,), res_blocks=1,
            segment_len=16, segment_stride=8,
        )
        x = jnp.zeros((2, 1, n))
        out, _ = _run(net, x, x, jnp.full((2, 1, 1), 0.5))
        assert out.shape == (2, 1, n)


class TestVariableUNet:
    def test_shape(self):
        net = UNetModified2_VariableNoiseLevel(
            inner_channel=8, norm_groups=4, channel_mults=(1, 2),
            res_blocks=1, noise_level_channel=16,
        )
        seg = jnp.zeros((2, 1, 8, 16))  # [B, 1, N, L]
        nl = jnp.full((2, 1, 8, 1), 0.5)
        params = net.init(jax.random.PRNGKey(0), seg, seg, nl)
        out = net.apply(params, seg, seg, nl)
        assert out.shape == (2, 1, 8, 16)

    def test_per_segment_noise_matters(self):
        net = UNetModified2_VariableNoiseLevel(
            inner_channel=8, norm_groups=4, channel_mults=(1, 2),
            res_blocks=1, noise_level_channel=16,
        )
        seg = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 8, 16))
        nl_a = jnp.full((1, 1, 8, 1), 0.1)
        nl_b = nl_a.at[0, 0, 3, 0].set(0.9)  # change one segment's level
        params = net.init(jax.random.PRNGKey(0), seg, seg, nl_a)
        a = net.apply(params, seg, seg, nl_a)
        b = net.apply(params, seg, seg, nl_b)
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestSNREstimator:
    def test_shape(self):
        net = SNREstimator(
            n_segments=8, segment_len=16, inner_channel=8, norm_groups=4,
            channel_mults=(1, 2), res_blocks=1,
        )
        seg = jnp.zeros((2, 1, 8, 16))
        params = net.init(jax.random.PRNGKey(0), seg)
        out = net.apply(params, seg)
        assert out.shape == (2, 8)


class TestTSTNN:
    def test_shape(self):
        n = (6 - 1) * 8 + 16  # 6 frames of 16 @ stride 8
        net = TSTNN(num_samples=n, F=16, stride=8, n_channels=8)
        x = jnp.zeros((2, 1, n))
        out, _ = _run(net, x, x, jnp.full((2, 1, 1), 0.5))
        assert out.shape == (2, 1, n)

    def test_ignores_noise_level(self):
        n = (6 - 1) * 8 + 16
        net = TSTNN(num_samples=n, F=16, stride=8, n_channels=8)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 1, n))
        params = net.init(jax.random.PRNGKey(0), x, x, jnp.ones((1, 1, 1)))
        a = net.apply(params, x, x, jnp.full((1, 1, 1), 0.1))
        b = net.apply(params, x, x, jnp.full((1, 1, 1), 0.9))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestDiffWave:
    def test_shape(self):
        hop = 256
        frames = 4
        net = DiffWave(freq_bins=33, residual_channels=8, residual_layers=4,
                       dilation_cycle_length=2)
        spec = jnp.zeros((2, 33, frames))
        audio = jnp.zeros((2, 1, hop * frames))
        t = jnp.full((2, 1, 1), 3.0)
        params = net.init(jax.random.PRNGKey(0), spec, audio, t)
        out = net.apply(params, spec, audio, t)
        assert out.shape == (2, 1, hop * frames)


class TestWaveGradFamily:
    def test_wavegrad_vocoder(self):
        hop = 300
        frames = 2
        net = WaveGrad()
        spec = jnp.zeros((1, 128, frames))
        audio = jnp.zeros((1, 1, hop * frames))
        nl = jnp.full((1, 1, 1), 0.5)
        params = net.init(jax.random.PRNGKey(0), spec, audio, nl)
        out = net.apply(params, spec, audio, nl)
        assert out.shape == (1, 1, hop * frames)

    def test_denoise_wavegrad1(self):
        n = 400  # divisible by 80 (y path) and 400 (x path)
        net = DenoiseWaveGrad1()
        x = jnp.zeros((1, 1, n))
        out, _ = _run(net, x, x, jnp.full((1, 1, 1), 0.5))
        assert out.shape == (1, 1, n)

    def test_denoise_wavegrad2(self):
        n = 512  # divisible by 2^8
        net = DenoiseWaveGrad2()
        x = jnp.zeros((1, 1, n))
        out, _ = _run(net, x, x, jnp.full((1, 1, 1), 0.5))
        assert out.shape == (1, 1, n)

    def test_denoise_wavegrad3(self):
        n = 600  # divisible by 300
        net = DenoiseWaveGrad3()
        x = jnp.zeros((1, 1, n))
        out, _ = _run(net, x, x, jnp.full((1, 1, 1), 0.5))
        assert out.shape == (1, 1, n)


class TestSpectrogramUpsampler:
    def test_matches_flax_conv_transpose(self):
        """The einsum 16-phase decomposition (models/diffwave.py::
        ConvTranspose — the TPU form that avoids the C=1 lane-pad OOM)
        must equal flax's ConvTranspose + torch output-size crop."""
        import flax.linen as nn
        import numpy as np

        from sddm_tpu.models.diffwave import ConvTranspose

        rng = np.random.default_rng(3)
        b, f, t = 2, 9, 5
        x = jnp.asarray(rng.standard_normal((b, f, t, 1)).astype(np.float32))
        k = rng.standard_normal((3, 32, 1, 1)).astype(np.float32)
        bias = rng.standard_normal((1,)).astype(np.float32)
        params = {"params": {"kernel": jnp.asarray(k),
                             "bias": jnp.asarray(bias)}}

        ref = nn.ConvTranspose(
            1, (3, 32), strides=(1, 16), padding="VALID"
        ).apply(params, x)[:, 1:-1, 8:-8, 0]          # [B, F, 16T]

        got = ConvTranspose(
            1, (3, 32), strides=(1, 16), padding="VALID"
        ).apply(params, jnp.swapaxes(x[..., 0], 1, 2))  # [B, 16T, F]
        np.testing.assert_allclose(
            np.swapaxes(np.asarray(got), 1, 2), np.asarray(ref),
            rtol=1e-5, atol=1e-5)
