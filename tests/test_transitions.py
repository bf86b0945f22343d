"""Property/parity tests for q/p transitions (reference model/diffusion.py:164-326)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from sddm_tpu.diffusion import DiffusionSchedule, transitions as tr
from sddm_tpu.diffusion import variable as var


def _sched(T=20):
    return DiffusionSchedule.create("linear", T, 1e-6, 1e-3)


class TestQ:
    def test_q_stochastic_properties(self):
        s = _sched(50)
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(jax.random.PRNGKey(1), (8, 1, 64))
        x_t, noise, level, t_cont = tr.q_stochastic(s, x0, key)
        assert x_t.shape == x0.shape == noise.shape
        assert level.shape == (8, 1, 1) and t_cont.shape == (8, 1, 1)
        # continuous level lies between adjacent sqrt_alpha_bar entries
        t = np.floor(np.asarray(t_cont).reshape(-1)).astype(int)
        lv = np.asarray(level).reshape(-1)
        sab = np.asarray(s.sqrt_alpha_bar)
        assert np.all(lv <= sab[t - 1] + 1e-6)
        assert np.all(lv >= sab[np.minimum(t, 50)] - 1e-6)
        # mixture identity: x_t = l*x0 + sqrt(1-l^2)*eps
        recon = np.asarray(level) * np.asarray(x0) + np.sqrt(
            1 - np.asarray(level) ** 2
        ) * np.asarray(noise)
        np.testing.assert_allclose(np.asarray(x_t), recon, rtol=1e-5, atol=1e-6)

    def test_q_stochastic_integer(self):
        s = _sched(50)
        x0 = jnp.ones((4, 1, 32))
        x_t, noise, level, t_cont = tr.q_stochastic(
            s, x0, jax.random.PRNGKey(2), t_is_integer=True
        )
        t = np.asarray(t_cont).reshape(-1).astype(int)
        np.testing.assert_allclose(
            np.asarray(level).reshape(-1),
            np.asarray(s.sqrt_alpha_bar)[t],
            rtol=1e-6,
        )

    def test_q_conditional_identity(self):
        s = _sched(50)
        x0 = jax.random.normal(jax.random.PRNGKey(3), (4, 1, 32))
        y = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 32))
        x_t, combined, level = tr.q_stochastic_conditional(
            s, x0, y, jax.random.PRNGKey(5)
        )
        # invert: x_t - sqrt_ab*x0 should equal combined * sqrt(1 - ab)
        ab = np.asarray(level) ** 2
        lhs = np.asarray(x_t) - np.asarray(level) * np.asarray(x0)
        rhs = np.asarray(combined) * np.sqrt(1 - ab)
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4, atol=1e-6)


class TestP:
    def test_p_transition_t1_deterministic(self):
        """At t=1 no noise is added: x_0 = (x_1 - pnc*eps)/sqrt(alpha_1)."""
        s = _sched(20)
        x = jnp.full((2, 1, 16), 0.5)
        eps = jnp.full((2, 1, 16), 0.1)
        out = tr.p_transition(s, x, jnp.asarray(1), eps, jax.random.PRNGKey(0))
        expect = (0.5 - float(s.predicted_noise_coeff[1]) * 0.1) / np.sqrt(
            float(s.alphas[1])
        )
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)

    def test_p_transition_clip(self):
        s = _sched(20)
        x = jnp.full((1, 1, 8), 50.0)
        eps = jnp.zeros((1, 1, 8))
        out = tr.p_transition(s, x, jnp.asarray(1), eps, jax.random.PRNGKey(0))
        assert np.all(np.asarray(out) <= 1.0)

    def test_sr3_vs_original_mean(self):
        """Means agree at t=1 (both noiseless there)."""
        s = _sched(20)
        x = jnp.full((1, 1, 8), 0.3)
        eps = jnp.full((1, 1, 8), 0.2)
        a = tr.p_transition(s, x, jnp.asarray(1), eps, jax.random.PRNGKey(0))
        b = tr.p_transition_sr3(s, x, jnp.asarray(1), eps, jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_supportive_t1(self):
        s = _sched(20)
        x = jnp.full((1, 1, 8), 0.3)
        eps = jnp.full((1, 1, 8), 0.2)
        y = jnp.full((1, 1, 8), 0.4)
        out = tr.p_transition_supportive(
            s, x, jnp.asarray(1), eps, y, jax.random.PRNGKey(0)
        )
        gamma = float(s.supportive_gamma[1])
        mu = 0.3 - float(s.predicted_noise_coeff[1]) * 0.2
        expect = ((1 - gamma) * mu + gamma * 0.4) / np.sqrt(float(s.alphas[1]))
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)

    def test_conditional_t1(self):
        s = _sched(20)
        x = jnp.full((1, 1, 8), 0.3)
        eps = jnp.full((1, 1, 8), 0.2)
        y = jnp.full((1, 1, 8), 0.4)
        out = tr.p_transition_conditional(
            s, x, jnp.asarray(1), eps, y, jax.random.PRNGKey(0)
        )
        expect = (
            float(s.c_xt[1]) * 0.3 + float(s.c_yt[1]) * 0.4 - float(s.c_epst[1]) * 0.2
        )
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4)

    def test_x_T_init(self):
        s = _sched(20)
        y = jnp.zeros((2, 1, 32))
        x_T = tr.get_x_T(s, y, jax.random.PRNGKey(0))
        assert x_T.shape == y.shape
        # with zero condition, x_T is pure scaled noise with std sqrt(1-ab_T)
        std = float(np.std(np.asarray(x_T)))
        expect = np.sqrt(1 - float(s.alpha_bar[-1]))
        assert abs(std - expect) < 0.3 * expect + 0.05


@pytest.mark.slow
class TestVariable:
    def test_tables_shape_and_ramp(self):
        snr = jnp.asarray([[0.0, 10.0], [20.0, -5.0]])  # [B=2, N=2]
        v = var.variable_tables(snr, n_timestep=10, snr_estimate_scale=100.0)
        assert v.betas.shape == (2, 1, 2, 11)
        b = np.asarray(v.betas)
        assert np.all(b[..., 0] == 0)
        # ramp starts at linear_start and ends at (10^(snr/-20)/scale)^2
        np.testing.assert_allclose(b[..., 1], 1e-6, rtol=1e-4)
        expect_end = (10.0 ** (np.asarray(snr) / -20) / 100.0) ** 2
        np.testing.assert_allclose(b[:, 0, :, -1], expect_end, rtol=1e-4)
        # cumprod consistency
        np.testing.assert_allclose(
            np.asarray(v.alpha_bar), np.cumprod(1 - b, axis=-1), rtol=1e-5
        )

    def test_tables_finite_at_extreme_snr(self):
        # Round-5 chip run: the trained estimator correctly predicts
        # <= -40 dB on silent/pure-noise segments; the unclamped reference
        # formula (model/diffusion.py:349) then yields beta > 1 and
        # sqrt(cumprod(1-beta)) NaN — the joint leg trained on NaN from
        # step one.  The endpoint is now clamped to beta <= 0.999.
        snr = jnp.asarray([[-96.0, -40.1, 33.0, 0.0]])
        v = var.variable_tables(snr, n_timestep=10, snr_estimate_scale=100.0)
        b = np.asarray(v.betas)
        ab = np.asarray(v.alpha_bar)
        assert np.isfinite(b).all() and np.isfinite(ab).all()
        assert np.isfinite(np.asarray(v.sqrt_alpha_bar)).all()
        assert (b <= 0.999).all() and (b >= 0.0).all()
        assert (ab > 0.0).all() and (ab <= 1.0).all()
        # the -96 dB segment saturates at the maximal schedule
        np.testing.assert_allclose(b[0, 0, 0, -1], 0.999, rtol=1e-6)

    def test_variable_q_and_p(self):
        snr = jnp.zeros((2, 4))
        v = var.variable_tables(snr, n_timestep=10)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 4, 16))
        x_t, noise, level, t = var.q_stochastic(v, x0, jax.random.PRNGKey(1))
        assert x_t.shape == x0.shape and level.shape == (2, 1, 4, 1)
        out = var.p_transition(
            v, x_t, jnp.asarray(5), x_t * 0, jax.random.PRNGKey(2)
        )
        assert out.shape == x0.shape
        x_T = var.get_x_T(v, x0, jax.random.PRNGKey(3))
        assert x_T.shape == x0.shape
