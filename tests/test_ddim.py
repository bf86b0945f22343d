"""DDIM sampler (TPU-era extension beyond the reference; the reference
ships only ancestral samplers, model/diffusion.py:164-223).

Core invariant: with an ORACLE denoiser that returns the exact noise used
to build x_T, every DDIM step keeps the trajectory on the closed form
x_t = sqrt(ab_t) x_0 + sqrt(1 - ab_t) eps, so the sampler recovers x_0
exactly (no network error, no stochasticity at eta=0).  Amplitudes are
kept < 1/sqrt(2) so the per-step [-1, 1] clamp never engages.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sddm_tpu.diffusion import DiffusionSchedule
from sddm_tpu.diffusion import transitions as tr
from sddm_tpu.models import SDDM


class OracleNet:
    """Duck-typed 'network' that always predicts the fixed true noise."""

    def __init__(self, eps):
        self.eps = eps

    def init(self, key, *a, **k):
        return {}

    def apply(self, params, condition, x_t, noise_level, **kw):
        return self.eps.astype(x_t.dtype)


def _setup(T=20, shape=(2, 1, 64)):
    sched = DiffusionSchedule.create("linear", T, 1e-6, 1e-2)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x0 = 0.5 * jax.random.uniform(k1, shape, minval=-1.0, maxval=1.0)
    eps = 0.5 * jax.random.uniform(k2, shape, minval=-1.0, maxval=1.0)
    return sched, x0, eps


class TestDDIMTransition:
    def test_t1_returns_x0_hat_exactly(self):
        """ab_0 = 1 (zero-pad convention) => the final step emits x0_hat
        with zero noise even at eta=1."""
        sched, x0, eps = _setup()
        ab1 = sched.alpha_bar[1]
        x1 = jnp.sqrt(ab1) * x0 + jnp.sqrt(1.0 - ab1) * eps
        out = tr.p_transition_ddim(
            sched, x1, jnp.asarray(1), eps, jax.random.PRNGKey(3), eta=1.0
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-6)

    def test_eta0_consumes_no_prng(self):
        sched, x0, eps = _setup()
        ab = sched.alpha_bar[5]
        x5 = jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * eps
        a = tr.p_transition_ddim(sched, x5, jnp.asarray(5), eps,
                                 jax.random.PRNGKey(0))
        b = tr.p_transition_ddim(sched, x5, jnp.asarray(5), eps,
                                 jax.random.PRNGKey(99))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_stays_on_closed_form(self):
        """One eta=0 step from the closed-form x_t lands on the closed-form
        x_{t-1} (the oracle trajectory is invariant)."""
        sched, x0, eps = _setup()
        for t in (2, 7, 19):
            ab_t = sched.alpha_bar[t]
            ab_p = sched.alpha_bar[t - 1]
            x_t = jnp.sqrt(ab_t) * x0 + jnp.sqrt(1.0 - ab_t) * eps
            want = jnp.sqrt(ab_p) * x0 + jnp.sqrt(1.0 - ab_p) * eps
            got = tr.p_transition_ddim(
                sched, x_t, jnp.asarray(t), eps, jax.random.PRNGKey(0)
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-6
            )

    def test_eta1_adds_noise_above_t1(self):
        sched, x0, eps = _setup()
        ab = sched.alpha_bar[5]
        x5 = jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * eps
        a = tr.p_transition_ddim(sched, x5, jnp.asarray(5), eps,
                                 jax.random.PRNGKey(0), eta=1.0)
        b = tr.p_transition_ddim(sched, x5, jnp.asarray(5), eps,
                                 jax.random.PRNGKey(99), eta=1.0)
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestDDIMSampler:
    def _model(self, sched, eps, **kw):
        return SDDM(sched, OracleNet(eps), p_transition="ddim", **kw)

    def test_full_chain_recovers_x0(self):
        """x_T = get_x_T(condition=x0, noise=eps) is ON the closed form, so
        the T-step eta=0 scan recovers x0 exactly."""
        sched, x0, eps = _setup()
        model = self._model(sched, eps)
        out = model.infer({}, jax.random.PRNGKey(0), x0,
                          noise_stream=(eps, jnp.zeros((sched.num_timesteps,)
                                                       + x0.shape)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-5)

    def test_subsampled_chain_recovers_x0(self):
        """DDIM composes with with_sampling_steps: a 5-step subsequence of
        the 20-step schedule also recovers x0 (the oracle trajectory only
        needs consistent alpha_bar lookups, not every step)."""
        sched, x0, eps = _setup()
        model = self._model(sched, eps).with_sampling_steps(5)
        assert model.num_timesteps == 5
        out = model.infer({}, jax.random.PRNGKey(0), x0,
                          noise_stream=(eps, jnp.zeros((5,) + x0.shape)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-5)

    def test_deterministic_across_keys(self):
        sched, x0, eps = _setup()
        model = self._model(sched, eps)
        a = model.infer({}, jax.random.PRNGKey(0), x0,
                        noise_stream=(eps, jnp.zeros((20,) + x0.shape)))
        b = model.infer({}, jax.random.PRNGKey(7), x0,
                        noise_stream=(eps, jnp.zeros((20,) + x0.shape)))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_with_ddim_copy(self):
        sched, x0, eps = _setup()
        base = SDDM(sched, OracleNet(eps), p_transition="condition_in")
        fast = base.with_ddim(0.3)
        assert fast.p_transition == "ddim" and fast.ddim_eta == 0.3
        assert base.p_transition == "condition_in"  # original untouched

    def test_with_ddim_conditional_q_uses_conditional_update(self):
        sched, x0, eps = _setup()
        model = SDDM(sched, OracleNet(eps), p_transition="conditional",
                     q_transition="conditional")
        fast = model.with_ddim()
        assert fast.p_transition == "ddim_conditional"


class OracleCondNet:
    """Oracle for the CONDITIONAL q: returns the exact combined noise
    c = (x_t - sqrt(ab_t) x0) / sqrt(1 - ab_t) implied by the trajectory
    (noise_level IS sqrt(ab_t) in the conditional sampler)."""

    def __init__(self, x0):
        self.x0 = x0

    def init(self, key, *a, **k):
        return {}

    def apply(self, params, condition, x_t, noise_level, **kw):
        nl = noise_level.astype(x_t.dtype)
        return (x_t - nl * self.x0.astype(x_t.dtype)) / jnp.sqrt(
            jnp.maximum(1.0 - jnp.square(nl), 1e-12))


class TestDDIMConditional:
    def test_t1_returns_x0_exactly(self):
        """m_0 = 0, delta_0 = 0, ab_0 = 1 collapse the final conditional
        DDIM step to x0_hat with zero direction/noise terms."""
        sched, x0, eps = _setup()
        y = 0.4 * jax.random.uniform(jax.random.PRNGKey(5), x0.shape,
                                     minval=-1.0, maxval=1.0)
        ab1, m1 = sched.alpha_bar[1], sched.m[1]
        x1 = (jnp.sqrt(ab1) * x0 + m1 * jnp.sqrt(ab1) * (y - x0)
              + sched.sqrt_delta[1] * eps)
        c = (x1 - jnp.sqrt(ab1) * x0) / jnp.sqrt(1.0 - ab1)
        out = tr.p_transition_ddim_conditional(
            sched, x1, jnp.asarray(1), c, y, jax.random.PRNGKey(3), eta=1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                   atol=1e-5)

    def test_oracle_chain_recovers_x0(self):
        """Full conditional DDIM chain with the oracle combined-noise
        predictor is an identity on x0 (the x0-closure holds at every
        step; t=1 emits x0_hat exactly)."""
        sched, x0, _ = _setup()
        y = 0.4 * jax.random.uniform(jax.random.PRNGKey(5), x0.shape,
                                     minval=-1.0, maxval=1.0)
        model = SDDM(sched, OracleCondNet(x0), p_transition="conditional",
                     q_transition="conditional").with_ddim()
        out = model.infer({}, jax.random.PRNGKey(0), y)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                   atol=1e-4)

    def test_oracle_chain_fewstep(self):
        """Composes with with_sampling_steps (subsampled m/delta tables
        equal the original tables at the kept steps)."""
        sched, x0, _ = _setup()
        y = 0.4 * jax.random.uniform(jax.random.PRNGKey(5), x0.shape,
                                     minval=-1.0, maxval=1.0)
        model = SDDM(sched, OracleCondNet(x0), p_transition="conditional",
                     q_transition="conditional").with_ddim()
        out = model.with_sampling_steps(4).infer({}, jax.random.PRNGKey(0), y)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                   atol=1e-4)

    def test_eta1_differs_from_eta0(self):
        # constant predictor (NOT the closure oracle, whose x0_hat is
        # x_t-independent): injected noise must propagate to the output
        sched, x0, eps = _setup()
        y = 0.4 * jax.random.uniform(jax.random.PRNGKey(5), x0.shape,
                                     minval=-1.0, maxval=1.0)
        mk = lambda eta: SDDM(  # noqa: E731
            sched, OracleNet(0.3 * eps), p_transition="conditional",
            q_transition="conditional").with_ddim(eta)
        a = mk(0.0).infer({}, jax.random.PRNGKey(0), y)
        b = mk(1.0).infer({}, jax.random.PRNGKey(0), y)
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestDDIMSpectrogram:
    def test_vocoder_chain_recovers_x0(self):
        """SDDM_spectrogram.with_ddim dispatches to the DDIM transition
        (the vocoder _reverse_step hardcodes the ancestral update
        otherwise) — the oracle chain from an injected closed-form x_T
        recovers x0 through the pure-noise start."""
        from sddm_tpu.models import SDDM_spectrogram

        T, hop, frames = 20, 16, 4
        sched = DiffusionSchedule.create("linear", T, 1e-6, 1e-2)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x0 = 0.5 * jax.random.uniform(k1, (2, 1, hop * frames),
                                      minval=-1.0, maxval=1.0)
        eps = 0.5 * jax.random.uniform(k2, x0.shape, minval=-1.0, maxval=1.0)
        spec = jnp.zeros((2, 8, frames))
        model = SDDM_spectrogram(sched, OracleNet(eps), hop_samples=hop)
        fast = model.with_ddim().with_sampling_steps(5)
        ab_T = fast.diffusion.alpha_bar[-1]
        x_T = jnp.sqrt(ab_T) * x0 + jnp.sqrt(1.0 - ab_T) * eps
        out = fast.infer({}, jax.random.PRNGKey(0), spec,
                         noise_stream=(x_T, jnp.zeros((5,) + x0.shape)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                   atol=1e-5)

    def test_vocoder_ddim_differs_from_ancestral(self):
        from sddm_tpu.models import SDDM_spectrogram

        T, hop, frames = 20, 16, 4
        sched = DiffusionSchedule.create("linear", T, 1e-6, 1e-2)
        eps = 0.3 * jax.random.uniform(jax.random.PRNGKey(2),
                                       (2, 1, hop * frames),
                                       minval=-1.0, maxval=1.0)
        spec = jnp.zeros((2, 8, frames))
        model = SDDM_spectrogram(sched, OracleNet(eps), hop_samples=hop)
        a = model.infer({}, jax.random.PRNGKey(0), spec)
        b = model.with_ddim().infer({}, jax.random.PRNGKey(0), spec)
        assert not np.allclose(np.asarray(a), np.asarray(b))
