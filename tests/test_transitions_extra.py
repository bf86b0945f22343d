"""Extra transition properties: vmap/scan safety, sr3 parity vs reference,
trajectory consistency of the supportive initialization."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sddm_tpu.diffusion import DiffusionSchedule, transitions as tr


def _sched(T=20):
    return DiffusionSchedule.create("linear", T, 1e-6, 1e-3)


class TestJitVmapSafety:
    def test_p_transition_scan(self):
        """All transitions must run inside lax.scan over traced t."""
        s = _sched(10)
        x = jnp.zeros((2, 1, 16))
        y = jnp.zeros((2, 1, 16))
        key = jax.random.PRNGKey(0)

        def run(fn, needs_cond):
            def step(carry, t):
                xt, k = carry
                k, sub = jax.random.split(k)
                args = (s, xt, t, jnp.zeros_like(xt)) + (
                    (y, sub) if needs_cond else (sub,)
                )
                return (fn(*args), k), None

            (out, _), _ = jax.lax.scan(
                step, (x, key), jnp.arange(10, 0, -1)
            )
            return out

        for fn, needs_cond in [
            (tr.p_transition, False),
            (tr.p_transition_sr3, False),
            (tr.p_transition_supportive, True),
            (tr.p_transition_conditional, True),
        ]:
            out = jax.jit(lambda: run(fn, needs_cond))()
            assert np.all(np.isfinite(np.asarray(out)))

    def test_q_stochastic_jit(self):
        s = _sched(10)
        out = jax.jit(lambda k: tr.q_stochastic(s, jnp.zeros((4, 1, 8)), k))(
            jax.random.PRNGKey(1)
        )
        assert out[0].shape == (4, 1, 8)

    def test_per_example_t_vector(self):
        """Transition tables index correctly with a [B] vector of t's
        (training-style per-example steps)."""
        s = _sched(10)
        t_vec = jnp.asarray([1, 5, 10])
        coeff = s.predicted_noise_coeff[t_vec]
        assert coeff.shape == (3,)
        np.testing.assert_allclose(
            np.asarray(coeff),
            np.asarray(s.predicted_noise_coeff)[[1, 5, 10]],
        )


@pytest.mark.skipif(not Path("/root/reference").exists(),
                    reason="reference unavailable")
class TestSr3Parity:
    def test_sr3_t1(self):
        torch = pytest.importorskip("torch")
        sys.path.insert(0, "/root/reference")
        from model.diffusion import GaussianDiffusion as RefDiffusion

        ref = RefDiffusion("linear", 20, 1e-6, 1e-3, device="cpu")
        ours = _sched(20)
        rng = np.random.RandomState(0)
        x = rng.uniform(-0.5, 0.5, (2, 1, 32)).astype(np.float32)
        eps = rng.uniform(-0.5, 0.5, (2, 1, 32)).astype(np.float32)
        ref_out = ref.p_transition_sr3(
            torch.from_numpy(x.copy()), 1, torch.from_numpy(eps)
        ).numpy()
        our_out = np.asarray(
            tr.p_transition_sr3(
                ours, jnp.asarray(x), jnp.asarray(1), jnp.asarray(eps),
                jax.random.PRNGKey(0),
            )
        )
        np.testing.assert_allclose(our_out, ref_out, rtol=2e-3, atol=1e-5)


class TestSupportiveInit:
    def test_supportive_x_T_is_condition(self):
        """supportive mode starts the sampler from the condition itself
        (reference model/model.py:63-65)."""
        from sddm_tpu.models import SDDM, UNetModified2

        s = _sched(5)
        net = UNetModified2(
            num_samples=72, inner_channel=8, norm_groups=4,
            channel_mults=(1, 2), res_blocks=1, segment_len=16,
            segment_stride=8,
        )
        m = SDDM(s, net, p_transition="supportive")
        c = jnp.ones((1, 1, 72)) * 0.3
        x_T = m._x_T(jax.random.PRNGKey(0), c)
        np.testing.assert_array_equal(np.asarray(x_T), np.asarray(c))
