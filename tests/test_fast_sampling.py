"""Fast sampling via schedule subsampling (with_sampling_steps)."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sddm_tpu.diffusion import DiffusionSchedule, subsample_schedule
from sddm_tpu.models import SDDM, UNetModified2


class TestSubsampleSchedule:
    def test_full_subsample_is_identity(self):
        s = DiffusionSchedule.create("linear", 50, 1e-6, 1e-3)
        sub, t_map = subsample_schedule(s, 50)
        assert sub.num_timesteps == 50
        np.testing.assert_array_equal(np.asarray(t_map), np.arange(51))
        np.testing.assert_allclose(
            np.asarray(sub.alpha_bar), np.asarray(s.alpha_bar), rtol=1e-6
        )
        # betas are re-derived from f32 alpha_bar ratios: ~1e-7 abs noise on
        # 1e-6-scale values is inherent
        np.testing.assert_allclose(
            np.asarray(sub.betas), np.asarray(s.betas), rtol=1e-3, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(sub.sigma), np.asarray(s.sigma), rtol=5e-2, atol=1e-6
        )

    def test_subsequence_alpha_bar(self):
        s = DiffusionSchedule.create("linear", 100, 1e-6, 1e-3)
        sub, t_map = subsample_schedule(s, 10)
        assert sub.num_timesteps == 10
        # last step always included; alpha_bar values are a subsequence
        assert int(t_map[-1]) == 100
        np.testing.assert_allclose(
            np.asarray(sub.alpha_bar)[1:],
            np.asarray(s.alpha_bar)[np.asarray(t_map)[1:]],
            rtol=1e-6,
        )
        # consistency: cumprod of derived alphas reproduces alpha_bar
        np.testing.assert_allclose(
            np.cumprod(np.asarray(sub.alphas)),
            np.asarray(sub.alpha_bar),
            rtol=1e-5,
        )

    def test_bounds(self):
        s = DiffusionSchedule.create("linear", 20, 1e-6, 1e-3)
        with pytest.raises(ValueError):
            subsample_schedule(s, 0)
        with pytest.raises(ValueError):
            subsample_schedule(s, 21)


class TestFastSampler:
    @pytest.fixture(scope="class")
    def model(self):
        sched = DiffusionSchedule.create("linear", 10, 1e-6, 1e-3)
        net = UNetModified2(
            num_samples=72, inner_channel=8, norm_groups=4,
            channel_mults=(1, 2), res_blocks=1, segment_len=16,
            segment_stride=8,
        )
        m = SDDM(sched, net, p_transition="condition_in")
        params = m.init(jax.random.PRNGKey(0), (2, 1, 72))
        return m, params

    def test_fewer_steps_runs(self, model):
        m, params = model
        fast = m.with_sampling_steps(3)
        assert fast.num_timesteps == 3
        c = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (2, 1, 72))
        out = jax.jit(fast.infer)(params, jax.random.PRNGKey(2), c)
        assert out.shape == (2, 1, 72)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_original_model_unchanged(self, model):
        m, params = model
        _ = m.with_sampling_steps(3)
        assert m.num_timesteps == 10 and m._t_map is None

    def test_time_step_mapping(self, model):
        m, params = model
        ts_model = SDDM(
            m.diffusion, m.network, noise_condition="time_step",
            p_transition="condition_in",
        )
        fast = ts_model.with_sampling_steps(5)
        # subsampled step k must be conditioned on the ORIGINAL t value
        t_map = np.asarray(fast._t_map)
        assert t_map[-1] == 10 and len(t_map) == 6
        c = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (1, 1, 72))
        out = fast.infer(params, jax.random.PRNGKey(4), c)
        assert out.shape == (1, 1, 72)
