"""End-to-end composite tests: UNetModified2 + SDDM train forward + scan
sampler on tiny shapes (CPU backend)."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sddm_tpu.diffusion import DiffusionSchedule
from sddm_tpu.models import SDDM, UNetModified2
from sddm_tpu.models.losses import l1_loss, l2_loss, log_loss
from sddm_tpu.models.metrics import segment_sisnr, sisnr


def tiny_unet(num_samples=72):
    # 2 levels, 8 frames of 16 @ stride 8 -> spatial divisible by 4
    return UNetModified2(
        num_samples=num_samples,
        inner_channel=8,
        norm_groups=4,
        channel_mults=(1, 2),
        res_blocks=1,
        segment_len=16,
        segment_stride=8,
    )


@pytest.fixture(scope="module")
def sddm_setup():
    sched = DiffusionSchedule.create("linear", 5, 1e-6, 1e-3)
    net = tiny_unet()
    model = SDDM(sched, net, p_transition="condition_in")
    params = model.init(jax.random.PRNGKey(0), (2, 1, 72))
    return model, params


class TestUNet:
    def test_forward_shape(self, sddm_setup):
        model, params = sddm_setup
        x = jnp.zeros((2, 1, 72))
        nl = jnp.ones((2, 1, 1)) * 0.5
        out = model.network.apply(params, x, x, nl)
        assert out.shape == (2, 1, 72)
        assert out.dtype == jnp.float32

    def test_forward_depends_on_noise_level(self, sddm_setup):
        model, params = sddm_setup
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (1, 1, 72))
        a = model.network.apply(params, x, x, jnp.full((1, 1, 1), 0.1))
        b = model.network.apply(params, x, x, jnp.full((1, 1, 1), 0.9))
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestSDDM:
    def test_train_forward(self, sddm_setup):
        model, params = sddm_setup
        t = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 72))
        c = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 72))
        pred, noise = model.forward(params, jax.random.PRNGKey(4), t, c)
        assert pred.shape == noise.shape == (2, 1, 72)

    def test_infer(self, sddm_setup):
        model, params = sddm_setup
        c = jax.random.normal(jax.random.PRNGKey(5), (2, 1, 72)) * 0.1
        out = jax.jit(model.infer)(params, jax.random.PRNGKey(6), c)
        assert out.shape == (2, 1, 72)
        assert np.all(np.abs(np.asarray(out)) <= 1.0)

    def test_infer_trajectory(self, sddm_setup):
        model, params = sddm_setup
        c = jnp.zeros((1, 1, 72))
        x0, traj = model.infer(
            params, jax.random.PRNGKey(7), c, return_trajectory=True
        )
        assert traj.shape == (5, 1, 1, 72)
        np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(x0))

    def test_mode_validation(self, sddm_setup):
        model, _ = sddm_setup
        with pytest.raises(NotImplementedError):
            SDDM(model.diffusion, model.network, noise_condition="bogus")
        with pytest.raises(NotImplementedError):
            SDDM(model.diffusion, model.network, p_transition="bogus")
        with pytest.raises(NotImplementedError):
            SDDM(model.diffusion, model.network, q_transition="bogus")

    @pytest.mark.parametrize(
        "p_mode", ["original", "sr3", "supportive", "conditional", "condition_in"]
    )
    def test_all_p_modes_run(self, sddm_setup, p_mode):
        model, params = sddm_setup
        m = SDDM(model.diffusion, model.network, p_transition=p_mode)
        c = jnp.zeros((1, 1, 72))
        out = m.infer(params, jax.random.PRNGKey(8), c)
        assert out.shape == (1, 1, 72)

    def test_conditional_q(self, sddm_setup):
        model, params = sddm_setup
        m = SDDM(
            model.diffusion,
            model.network,
            q_transition="conditional",
            p_transition="conditional",
        )
        t = jax.random.normal(jax.random.PRNGKey(9), (2, 1, 72))
        c = jax.random.normal(jax.random.PRNGKey(10), (2, 1, 72))
        pred, noise = m.forward(params, jax.random.PRNGKey(11), t, c)
        assert pred.shape == noise.shape == (2, 1, 72)

    def test_time_step_conditioning(self, sddm_setup):
        model, params = sddm_setup
        m = SDDM(model.diffusion, model.network, noise_condition="time_step")
        t = jax.random.normal(jax.random.PRNGKey(12), (2, 1, 72))
        c = jax.random.normal(jax.random.PRNGKey(13), (2, 1, 72))
        pred, noise = m.forward(params, jax.random.PRNGKey(14), t, c)
        assert pred.shape == (2, 1, 72)
        out = m.infer(params, jax.random.PRNGKey(15), c)
        assert out.shape == (2, 1, 72)


class TestLossesMetrics:
    def test_losses(self):
        p = jnp.asarray([[1.0, 2.0]])
        t = jnp.asarray([[0.0, 0.0]])
        assert float(l1_loss(p, t)) == pytest.approx(1.5)
        assert float(l2_loss(p, t)) == pytest.approx(2.5)
        # XLA's f32 log is approximate; 1e-3 rel is ample
        assert float(log_loss(p, t)) == pytest.approx(np.log(1.5), rel=1e-3)

    def test_sisnr_perfect(self):
        s = jnp.asarray(np.random.RandomState(0).randn(2, 1, 100))
        assert float(sisnr(s, s)) > 50  # near-infinite for identical signals

    def test_sisnr_scale_invariance(self):
        s = jnp.asarray(np.random.RandomState(1).randn(2, 1, 100))
        assert float(sisnr(2.0 * s, s)) > 50

    def test_segment_sisnr_shape(self):
        rng = np.random.RandomState(2)
        s = jnp.asarray(rng.randn(3, 1, 4, 32))
        s_hat = jnp.asarray(rng.randn(3, 1, 4, 32))
        out = segment_sisnr(s_hat, s)
        assert out.shape == (3, 4)

    def test_segment_sisnr_finite_on_degenerate_segments(self):
        # Round-5 chip run: corpus v2's inter-syllable digital-silence
        # segments gave sum(clean^2)=0 -> NaN labels -> the SNR estimator
        # trained on NaN from step one.  The reference formula
        # (model/segmentor.py:7-33) has the same hole; ours is guarded.
        rng = np.random.RandomState(3)
        s = rng.randn(2, 1, 4, 32).astype(np.float32)
        s_hat = rng.randn(2, 1, 4, 32).astype(np.float32)
        s[0, 0, 1] = 0.0            # silent clean segment, noisy condition
        s_hat[1, 0, 2] = s[1, 0, 2]  # noise-free segment (e_noise == 0)
        out = np.asarray(segment_sisnr(jnp.asarray(s_hat), jnp.asarray(s)))
        assert np.isfinite(out).all()
        assert out[0, 1] < -40      # "all noise" label
        assert out[1, 2] > 40       # "no noise" label
        assert np.abs(out).max() < 120  # labels stay in a sane dB range
