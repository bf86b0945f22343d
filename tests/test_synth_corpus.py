"""Synthetic corpus generator (sddm_tpu/data/synth.py).

Corpus v2 exists to keep the quality metrics meaningful (round-3 verdict:
v1 utterances could lose >85% of frames to STOI's 40 dB silent-frame gate,
degenerating the metric).  These tests pin the properties the quality
evidence rests on.
"""

import numpy as np
import pytest

from sddm_tpu.data.synth import (
    SR,
    mix_at_snr,
    synth_clean,
    synth_clean_v2,
    synth_noise_v2,
)
from sddm_tpu.ops.stoi import stoi


class TestCleanV2:
    @pytest.mark.parametrize("i", [0, 1, 2])
    def test_stoi_self_identity(self, i):
        """stoi(clean, clean) == 1: no early-return from the silent-frame
        gate — the v1 failure mode this corpus revision fixes."""
        rng = np.random.default_rng([99, i])
        clean = synth_clean_v2(rng, duration_s=2.0)
        assert stoi(clean, clean, SR) > 0.999

    def test_deterministic_in_seed(self):
        a = synth_clean_v2(np.random.default_rng([5, 3]), 2.0)
        b = synth_clean_v2(np.random.default_rng([5, 3]), 2.0)
        np.testing.assert_array_equal(a, b)

    def test_rms_and_peak_bounded(self):
        rng = np.random.default_rng([7, 0])
        x = synth_clean_v2(rng, 2.5)
        rms = float(np.sqrt(np.mean(x**2)))
        assert 0.02 < rms < 0.09
        assert np.abs(x).max() <= 0.6 + 1e-6

    def test_energy_not_burst_dominated(self):
        """Frame energies must stay inside STOI's 40 dB dynamic range for
        most frames (v1 lost all but ~25/186 frames on some files)."""
        rng = np.random.default_rng([11, 4])
        x = synth_clean_v2(rng, 3.0).astype(np.float64)
        n, hop = 400, 200  # 25 ms frames at 16 kHz
        frames = np.stack([x[i:i + n]
                           for i in range(0, len(x) - n, hop)])
        e = 20 * np.log10(np.linalg.norm(frames, axis=1) + 1e-12)
        kept = (e > e.max() - 40.0).mean()
        assert kept > 0.6, f"only {kept:.0%} of frames inside the 40 dB gate"


class TestMix:
    def test_snr_is_achieved(self):
        rng = np.random.default_rng([3, 1])
        clean = synth_clean_v2(rng, 2.0)
        noise = synth_noise_v2(rng, len(clean))
        for snr in (0.0, 10.0):
            c, y = mix_at_snr(clean, noise, snr)
            d = y - c
            got = 10 * np.log10(np.mean(c**2) / np.mean(d**2))
            assert abs(got - snr) < 0.5, (snr, got)

    def test_v1_still_reproducible(self):
        a = synth_clean(np.random.default_rng([2, 2]), 2.0)
        b = synth_clean(np.random.default_rng([2, 2]), 2.0)
        np.testing.assert_array_equal(a, b)
