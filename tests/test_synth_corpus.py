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


class TestHardSplit:
    """test_hard/ split: the standard test grid shifted 10 dB down so
    STOI/pesq_approx operate out of their saturated >0.92 band (round-4
    verdict item 7: noisy STOI on the standard split averaged 0.922)."""

    def test_grid_is_10db_below_test(self):
        from sddm_tpu.data.synth import HARD_SNRS, TEST_SNRS

        assert tuple(h + 10.0 for h in HARD_SNRS) == tuple(TEST_SNRS)

    def test_generate_corpus_hard_split(self, tmp_path):
        from sddm_tpu.data.synth import generate_corpus
        from sddm_tpu.data.wav_io import load_wav

        root = tmp_path / "hard"
        generate_corpus(str(root), 4, seed=11, split="test_hard", version=2)
        names = sorted(p.name for p in (root / "clean").glob("*.wav"))
        assert len(names) == 4
        snrs = []
        for n in names:
            c, _ = load_wav(str(root / "clean" / n))
            y, _ = load_wav(str(root / "noisy" / n))
            c, y = c.reshape(-1), y.reshape(-1)
            d = y - c
            snrs.append(10 * np.log10(np.mean(c**2) / np.mean(d**2)))
        # every file lands on the hard grid (mix is exact to <0.5 dB)
        from sddm_tpu.data.synth import HARD_SNRS

        for got in snrs:
            assert min(abs(got - s) for s in HARD_SNRS) < 0.5, snrs
        # at least one genuinely low-SNR (negative) mix in a 4-file cycle
        assert min(snrs) < 0.0, snrs
