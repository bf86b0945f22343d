"""Framing / overlap-add exact-inverse and parity tests
(reference model/UNetModified2.py:5-41, model/segmentor.py:33-84)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sddm_tpu.ops.framing import Framer, Segmentor, frame_signal, overlap_add
from sddm_tpu.ops.logaudio import (
    log_modulus_normalize,
    log_modulus_normalize_reverse,
)


def _np_frame(sig, F, stride):
    n_frames = (sig.shape[-1] - F) // stride + 1
    idx = np.arange(n_frames)[:, None] * stride + np.arange(F)[None, :]
    return sig[..., idx]


def _np_overlap_add(frames, n_samples, stride):
    F = frames.shape[-1]
    out = np.zeros(frames.shape[:-2] + (n_samples,))
    for i in range(frames.shape[-2]):
        out[..., i * stride : i * stride + F] += frames[..., i, :]
    return out


class TestFraming:
    @pytest.mark.parametrize("F,stride", [(128, 64), (16, 8), (12, 4), (10, 3)])
    def test_frame_matches_numpy(self, F, stride):
        n = (7 - 1) * stride + F  # 7 frames
        x = np.random.RandomState(0).randn(2, 1, n)
        got = frame_signal(jnp.asarray(x), F, stride)
        np.testing.assert_allclose(np.asarray(got), _np_frame(x, F, stride), rtol=1e-6)

    @pytest.mark.parametrize("F,stride", [(128, 64), (16, 8), (10, 3)])
    def test_overlap_add_matches_numpy(self, F, stride):
        n = (5 - 1) * stride + F
        fr = np.random.RandomState(1).randn(2, 1, 5, F)
        got = overlap_add(jnp.asarray(fr), n, stride)
        np.testing.assert_allclose(
            np.asarray(got), _np_overlap_add(fr, n, stride), rtol=1e-5, atol=1e-7
        )

    def test_flagship_geometry(self):
        """config_unet.json: 16448 samples -> 256 frames of 128 @ stride 64."""
        f = Framer(16448, 128, 64)
        assert f.n_frames == 256
        x = jnp.arange(16448, dtype=jnp.float32)[None, None, :]
        frames = f(x)
        assert frames.shape == (1, 1, 256, 128)
        # overlap factor 2 in the interior: OLA of all-ones frames
        ola = f.overlap_add(jnp.ones_like(frames))
        v = np.asarray(ola)[0, 0]
        assert np.all(v[64:-64] == 2.0) and np.all(v[:64] == 1.0)

    def test_round_trip_adjoint(self):
        """overlap_add(frame(x)) == x * overlap_count."""
        f = Framer(96, 16, 8)
        x = jnp.asarray(np.random.RandomState(2).randn(1, 1, 96))
        y = np.asarray(f.overlap_add(f(x)))
        count = np.asarray(f.overlap_add(f(jnp.ones_like(x))))
        np.testing.assert_allclose(y, np.asarray(x) * count, rtol=1e-5)


class TestSegmentor:
    def test_weights(self):
        seg = Segmentor(96, 16, 8)
        w = np.asarray(seg.weight_mat)
        half = 8
        # first segment: ones then down-ramp
        assert np.all(w[0, :half] == 1.0)
        np.testing.assert_allclose(w[0, half:], np.linspace(1, 0, half))
        # interior (and last — reference's last-segment branch is unreachable)
        for i in range(1, seg.n_frames):
            np.testing.assert_allclose(w[i, :half], np.linspace(0, 1, half))
            np.testing.assert_allclose(w[i, half:], np.linspace(1, 0, half))

    def test_crossfade_reconstruction(self):
        """Cross-fade weights make segment(x) -> overlapAdd a near-identity in
        the interior (up+down ramps sum to 1)."""
        seg = Segmentor(96, 16, 8)
        x = jnp.asarray(np.random.RandomState(3).randn(1, 1, 96))
        y = np.asarray(seg.overlap_add(seg(x)))[0, 0]
        xx = np.asarray(x)[0, 0]
        # interior: each sample is covered by an up-ramp and a down-ramp that
        # sum to exactly 1 (linspace endpoints), so reconstruction is exact
        np.testing.assert_allclose(y[8:-8], xx[8:-8], rtol=1e-4)


class TestLogModulus:
    def test_round_trip(self):
        x = jnp.asarray(np.random.RandomState(4).uniform(-1, 1, size=(1000,)))
        y = log_modulus_normalize(x, 3)
        back = log_modulus_normalize_reverse(y, 3)
        # f32 round trip through 10**|x| amplifies rounding; 1e-3 abs is tight
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-3)
        assert np.all(np.abs(np.asarray(y)) <= 1.0)

    def test_known_value(self):
        # x=1: sign=1, log10(1000+1)/6
        y = float(log_modulus_normalize(jnp.asarray(1.0), 3))
        assert abs(y - np.log10(1001.0) / 6) < 1e-6
