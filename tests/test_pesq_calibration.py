"""Conformance-sweep calibration for pesq_wb_approx (VERDICT #6).

The certified P.862 library cannot be installed in this container, so the
approximator is anchored to what IS verifiable offline:

  - the published standard MOS-LQO logistic mappings (P.862.1 narrowband,
    P.862.2 Annex A wideband) are used verbatim;
  - the identical-signal ceiling reproduces the certified metric's
    well-known 4.64 (wb);
  - an additive-white-noise sweep over a synthetic speech-like reference
    must land within +-0.35 MOS of anchor targets in the
    literature-plausible range and be strictly monotone in SNR.

These anchors quantify the approximator's behavior; they are NOT a
certified error bar (stated in PARITY.md).  Reference consumer:
/root/reference/evaluate_results.py:19-22 (torchmetrics PESQ wrapper).
"""

import numpy as np
import pytest

from sddm_tpu.ops.pesq_approx import pesq_approx

FS = 16000

# (snr_dB, anchor MOS, tolerance)
ANCHORS = [
    (40, 4.4, 0.35),
    (30, 4.1, 0.35),
    (20, 3.3, 0.35),
    (14, 2.5, 0.35),
    (10, 2.0, 0.35),
    (4, 1.5, 0.25),
    (0, 1.3, 0.25),
]


def speechlike(n, fs, seed=0):
    """Harmonic series with pitch drift + syllabic AM + formant-ish rolloff."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    f0 = 120 + 20 * np.sin(2 * np.pi * 3.1 * t)
    ph = 2 * np.pi * np.cumsum(f0) / fs
    x = np.zeros(n)
    for h, a in [(1, 1.0), (2, 0.6), (3, 0.45), (4, 0.3), (5, 0.22),
                 (6, 0.15), (8, 0.1), (10, 0.06)]:
        x += a * np.sin(h * ph + rng.uniform(0, 2 * np.pi))
    x *= 0.55 + 0.45 * np.sin(2 * np.pi * 2.3 * t + 1.0)
    return x / np.sqrt(np.mean(x**2))


@pytest.fixture(scope="module")
def sweep():
    ref = speechlike(FS * 4, FS)
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(len(ref))
    noise /= np.sqrt(np.mean(noise**2))
    scores = {
        snr: pesq_approx(ref, ref + noise * 10 ** (-snr / 20), FS, "wb")
        for snr, _, _ in ANCHORS
    }
    return ref, noise, scores


def test_identical_signal_ceiling(sweep):
    """Certified PESQ-WB scores identical signals 4.64."""
    ref, _, _ = sweep
    assert abs(pesq_approx(ref, ref, FS, "wb") - 4.64) < 0.05


def test_pure_noise_floor(sweep):
    ref, noise, _ = sweep
    assert pesq_approx(ref, noise, FS, "wb") < 1.5


def test_sweep_within_anchor_tolerance(sweep):
    _, _, scores = sweep
    for snr, anchor, tol in ANCHORS:
        assert abs(scores[snr] - anchor) < tol, (
            f"SNR {snr} dB: {scores[snr]:.3f} vs anchor {anchor} (+-{tol})"
        )


def test_sweep_strictly_monotone(sweep):
    _, _, scores = sweep
    vals = [scores[snr] for snr, _, _ in ANCHORS]  # descending SNR order
    assert all(a > b for a, b in zip(vals, vals[1:]))


def test_nb_mode_still_monotone(sweep):
    ref, noise, _ = sweep
    prev = None
    for snr in (30, 15, 5):
        s = pesq_approx(ref, ref + noise * 10 ** (-snr / 20), FS, "nb")
        if prev is not None:
            assert s < prev
        prev = s
