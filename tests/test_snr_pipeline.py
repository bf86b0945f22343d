"""SNR-adaptive subsystem end-to-end: SDDM_with_SNREstimator forward/infer,
SNREstimatorTrainer one epoch, frozen-estimator semantics."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sddm_tpu.models.sddm import SDDM_with_SNREstimator
from sddm_tpu.models.snr_estimator import SNREstimator
from sddm_tpu.models.unet_variable import UNetModified2_VariableNoiseLevel
from sddm_tpu.ops.framing import Segmentor

NUM_SAMPLES = 96  # 11 segments of 16 @ stride 8 -> need n_frames div by 4
# (96-16)/8+1 = 11 — not divisible by 4 for 2 downsamples; use stride 8 F=16,
# choose n so n_frames = 8: n = (8-1)*8+16 = 72
NUM_SAMPLES = 72


@pytest.fixture(scope="module")
def snr_model():
    segmentor = Segmentor(NUM_SAMPLES, F=16, stride=8)
    net = UNetModified2_VariableNoiseLevel(
        inner_channel=8, norm_groups=4, channel_mults=(1, 2), res_blocks=1,
        noise_level_channel=16,
    )
    est = SNREstimator(
        n_segments=segmentor.n_frames, segment_len=segmentor.frame_len,
        inner_channel=8, norm_groups=4, channel_mults=(1, 2), res_blocks=1,
    )
    model = SDDM_with_SNREstimator(
        diffusion_timesteps=4, network=net, snr_estimator=est,
        segmentor=segmentor, p_transition="condition_in",
    )
    params = model.init(jax.random.PRNGKey(0), (2, 1, NUM_SAMPLES))
    return model, params


class TestSNRComposite:
    def test_forward(self, snr_model):
        model, params = snr_model
        t = jax.random.normal(jax.random.PRNGKey(1), (2, 1, NUM_SAMPLES))
        c = jax.random.normal(jax.random.PRNGKey(2), (2, 1, NUM_SAMPLES))
        pred, noise = model.forward(params, jax.random.PRNGKey(3), t, c)
        # segmented shapes [B, 1, N, L]
        assert pred.shape == (2, 1, 8, 16)
        assert noise.shape == (2, 1, 8, 16)

    def test_infer(self, snr_model):
        model, params = snr_model
        c = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (2, 1, NUM_SAMPLES))
        out = jax.jit(model.infer)(params, jax.random.PRNGKey(5), c)
        assert out.shape == (2, 1, NUM_SAMPLES)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_estimator_frozen(self, snr_model):
        """Gradients through forward must be zero for the estimator params
        (stop_gradient — reference freezes it,
        train_with_snr_estimator.py:48-52)."""
        model, params = snr_model
        t = jax.random.normal(jax.random.PRNGKey(6), (2, 1, NUM_SAMPLES))
        c = jax.random.normal(jax.random.PRNGKey(7), (2, 1, NUM_SAMPLES))

        def loss(p):
            pred, noise = model.forward(p, jax.random.PRNGKey(8), t, c)
            return jnp.mean(jnp.abs(pred - noise))

        grads = jax.grad(loss)(params)
        est_grads = jax.tree_util.tree_leaves(grads["snr_estimator"])
        assert all(float(jnp.abs(g).max()) == 0.0 for g in est_grads)
        net_grads = jax.tree_util.tree_leaves(grads["network"])
        assert any(float(jnp.abs(g).max()) > 0.0 for g in net_grads)

    def test_mode_validation(self, snr_model):
        model, _ = snr_model
        with pytest.raises(NotImplementedError):
            SDDM_with_SNREstimator(
                4, model.network, model.snr_estimator, model.segmentor,
                noise_condition="time_step",
            )


class TestSNRTrainerStep:
    def test_one_train_step(self, tmp_path):
        import optax

        from sddm_tpu.models.losses import l1_loss
        from sddm_tpu.models.metrics import segment_sisnr

        segmentor = Segmentor(NUM_SAMPLES, F=16, stride=8)
        est = SNREstimator(
            n_segments=segmentor.n_frames, segment_len=segmentor.frame_len,
            inner_channel=8, norm_groups=4, channel_mults=(1, 2), res_blocks=1,
        )
        tx = optax.adam(1e-3)
        seg_shape = (4, 1, segmentor.n_frames, segmentor.frame_len)
        params = est.init(jax.random.PRNGKey(0), jnp.zeros(seg_shape))
        opt_state = tx.init(params)

        target = jax.random.normal(jax.random.PRNGKey(1), (4, 1, NUM_SAMPLES))
        condition = target + 0.1 * jax.random.normal(
            jax.random.PRNGKey(2), (4, 1, NUM_SAMPLES)
        )

        def loss_fn(p):
            t_seg = segmentor(target)
            c_seg = segmentor(condition)
            true = segment_sisnr(c_seg, t_seg)
            out = est.apply(p, c_seg)
            return l1_loss(jnp.squeeze(out), true)

        loss0, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        loss1 = loss_fn(params)
        assert np.isfinite(float(loss0)) and np.isfinite(float(loss1))
