"""Numerical unit tests for the diffusion schedule tables against the
closed-form definitions (reference model/diffusion.py:49-161)."""

import numpy as np
import pytest

from sddm_tpu.diffusion import DiffusionSchedule, make_beta_schedule


def _expected_linear(T, start, end):
    betas = np.zeros(T + 1)
    betas[1:] = np.linspace(start, end, T)
    alphas = 1 - betas
    alpha_bar = np.cumprod(alphas)
    return betas, alphas, alpha_bar


class TestTables:
    def test_linear_tables(self):
        T, start, end = 100, 1e-6, 1e-3
        s = DiffusionSchedule.create("linear", T, start, end)
        betas, alphas, alpha_bar = _expected_linear(T, start, end)
        assert s.betas.shape == (T + 1,)
        np.testing.assert_allclose(np.asarray(s.betas), betas, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s.alpha_bar), alpha_bar, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(s.sqrt_alpha_bar), np.sqrt(alpha_bar), rtol=1e-6
        )
        assert s.betas[0] == 0.0 and s.alpha_bar[0] == 1.0

    def test_quad_tables(self):
        T = 50
        s = DiffusionSchedule.create("quad", T, 1e-4, 2e-2)
        expect = np.linspace(1e-4**0.5, 2e-2**0.5, T) ** 2
        np.testing.assert_allclose(np.asarray(s.betas[1:]), expect, rtol=1e-6)

    def test_cosine_tables(self):
        T = 100
        s = DiffusionSchedule.create("cosine", T)
        cs = 0.008
        ts = np.arange(T + 1) / T + cs
        f = np.cos(ts / (1 + cs) * np.pi / 2) ** 2
        ab = f / f[0]
        np.testing.assert_allclose(np.asarray(s.alpha_bar), ab, rtol=1e-5)
        betas = np.clip(1 - ab[1:] / ab[:-1], None, 0.999)
        np.testing.assert_allclose(np.asarray(s.betas[1:]), betas, rtol=1e-5)

    def test_p_coeffs(self):
        T = 100
        s = DiffusionSchedule.create("linear", T, 1e-6, 1e-3)
        betas, alphas, ab = _expected_linear(T, 1e-6, 1e-3)
        sigma = np.sqrt((1 - ab[:-1]) / (1 - ab[1:]) * betas[1:])
        pnc = betas[1:] / np.sqrt(1 - ab[1:])
        np.testing.assert_allclose(np.asarray(s.sigma[1:]), sigma, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(s.predicted_noise_coeff[1:]), pnc, rtol=1e-5
        )
        # supportive: gamma[1] = 0.2, gamma[t>=2] = sigma[t]
        assert np.isclose(float(s.supportive_gamma[1]), 0.2)
        np.testing.assert_allclose(
            np.asarray(s.supportive_gamma[2:]), sigma[1:], rtol=1e-5
        )
        sigma_hat = np.concatenate([[0.2], sigma[1:]])
        expect_hat = sigma - sigma_hat / np.sqrt(alphas[1:])
        np.testing.assert_allclose(
            np.asarray(s.supportive_sigma_hat[1:]), expect_hat, rtol=1e-4, atol=1e-7
        )

    def test_conditional_coeffs(self):
        T = 100
        s = DiffusionSchedule.create("linear", T, 1e-6, 1e-3)
        betas, alphas, ab = _expected_linear(T, 1e-6, 1e-3)
        sqrt_ab = np.sqrt(ab)
        m = np.sqrt((1 - ab) / sqrt_ab)
        delta = (1 - ab) - m**2 * ab
        np.testing.assert_allclose(np.asarray(s.m), m, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(s.sqrt_delta), np.sqrt(delta), rtol=1e-5, atol=1e-8
        )
        ratio = (1 - m[1:]) / (1 - m[:-1])
        atd = alphas[1:] * delta[:-1]
        dtg = delta[1:] - ratio**2 * atd
        sa = np.sqrt(alphas[1:])
        c_xt = ratio * delta[:-1] / delta[1:] * sa + (1 - m[:-1]) * (
            dtg / delta[1:]
        ) * (1 / sa)
        c_yt = (m[:-1] * delta[1:] - m[1:] * ratio * atd) * sqrt_ab[:-1] / delta[1:]
        c_epst = (1 - m[:-1]) * dtg / delta[1:] * np.sqrt(1 - ab[1:]) / sa
        d_est = dtg * delta[:-1] / delta[1:]
        np.testing.assert_allclose(np.asarray(s.c_xt[1:]), c_xt, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(s.c_yt[1:]), c_yt, rtol=1e-4, atol=1e-8)
        np.testing.assert_allclose(np.asarray(s.c_epst[1:]), c_epst, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(s.sqrt_delta_estimated[1:]), np.sqrt(d_est), rtol=1e-4,
            atol=1e-8,
        )


class TestBetaFactory:
    @pytest.mark.parametrize(
        "name", ["quad", "linear", "warmup10", "warmup50", "const", "jsd", "cosine"]
    )
    def test_shapes(self, name):
        betas = make_beta_schedule(name, 50)
        assert betas.shape == (50,)
        assert np.all(betas > 0) and np.all(betas <= 1.0)  # jsd ends at exactly 1

    def test_jsd(self):
        betas = make_beta_schedule("jsd", 10)
        np.testing.assert_allclose(betas, 1.0 / np.linspace(10, 1, 10))

    def test_warmup(self):
        betas = make_beta_schedule("warmup10", 100, 1e-4, 2e-2)
        assert np.isclose(betas[0], 1e-4)
        assert np.all(betas[10:] == 2e-2)
