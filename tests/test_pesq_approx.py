"""Property tests for the approximate PESQ estimator (monotonicity, range,
gain invariance — it cannot be validated bit-wise without the C library)."""

import numpy as np
import pytest

from sddm_tpu.ops.pesq_approx import pesq_approx


def speechlike(n=32000, seed=0):
    """Modulated multi-tone, speech-ish spectrum."""
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 16000.0
    sig = sum(
        a * np.sin(2 * np.pi * f * t + rng.uniform(0, 6))
        for f, a in [(220, 0.4), (440, 0.25), (880, 0.15), (1760, 0.08)]
    )
    envelope = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t))
    return (sig * envelope).astype(np.float64)


class TestPesqApprox:
    def test_identical_scores_high(self):
        x = speechlike()
        s = pesq_approx(x, x, 16000, "wb")
        assert s > 4.3

    def test_monotonic_with_noise(self):
        x = speechlike()
        rng = np.random.RandomState(1)
        noise = rng.randn(len(x))
        scores = [
            pesq_approx(x, x + lvl * noise, 16000, "wb")
            for lvl in (0.0, 0.01, 0.05, 0.2, 0.8)
        ]
        assert all(a >= b - 1e-6 for a, b in zip(scores, scores[1:])), scores
        assert scores[0] > 4.3 and scores[-1] < 2.5

    def test_range(self):
        x = speechlike()
        rng = np.random.RandomState(2)
        worst = pesq_approx(x, rng.randn(len(x)), 16000, "wb")
        assert 0.9 <= worst <= 4.7

    def test_gain_invariance(self):
        x = speechlike()
        y = x + 0.05 * np.random.RandomState(3).randn(len(x))
        a = pesq_approx(x, y, 16000, "wb")
        b = pesq_approx(x, 3.0 * y, 16000, "wb")
        assert abs(a - b) < 0.05

    def test_nb_mode(self):
        x = speechlike()
        s = pesq_approx(x, x, 16000, "nb")  # resamples to 8 kHz internally
        assert s > 4.0

    def test_short_signal(self):
        assert pesq_approx(np.zeros(100), np.zeros(100), 16000) == 1.0


class TestEvaluateIntegration:
    def test_approx_registered_when_lib_missing(self):
        from sddm_tpu.evaluate import make_evaluators

        ev = make_evaluators(16000)
        try:
            import pesq  # noqa: F401

            assert "pesq_wb" in ev
        except ImportError:
            assert "pesq_wb_approx" in ev
            x = speechlike(16000)
            assert ev["pesq_wb_approx"](x, x) > 4.3
