"""PackedUNetModified2 must reproduce UNetModified2 elementwise from the
SAME param tree, at every packed_levels setting (models/unet_packed.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; fast-tier coverage lives in test_packed.py

from sddm_tpu.models import UNetModified2
from sddm_tpu.models.unet_packed import PackedUNetModified2

NS = 72  # 8 frames of 16 @ stride 8
INNER = 8
GROUPS = 4


@pytest.fixture(scope="module")
def setup():
    net = UNetModified2(
        num_samples=NS, inner_channel=INNER, norm_groups=GROUPS,
        channel_mults=(1, 2, 3), res_blocks=1, segment_len=16,
        segment_stride=8,
    )
    rng = np.random.RandomState(0)
    cond = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 1, NS)).astype(np.float32))
    x_t = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 1, NS)).astype(np.float32))
    lvl = jnp.full((2, 1, 1), 0.7, jnp.float32)
    params = net.init(jax.random.PRNGKey(0), cond, x_t, lvl)
    ref = np.asarray(net.apply(params, cond, x_t, lvl))
    return net, params, cond, x_t, lvl, ref


class TestPackedModel:
    @pytest.mark.parametrize("levels", [0, 1, 2, 3])
    def test_matches_flax(self, setup, levels):
        net, params, cond, x_t, lvl, ref = setup
        eng = PackedUNetModified2(net, packed_levels=levels)
        pp = eng.pack(params)
        got = np.asarray(eng.apply(pp, cond, x_t, lvl))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    def test_in_sampler(self, setup):
        """Full packed engine drops into SDDM.infer unchanged."""
        from sddm_tpu.diffusion import DiffusionSchedule
        from sddm_tpu.models import SDDM

        net, params, cond, x_t, lvl, _ = setup
        sched = DiffusionSchedule.create("linear", 3, 1e-6, 1e-3)
        base = SDDM(sched, net, p_transition="condition_in")
        fast = SDDM(sched, PackedUNetModified2(net), p_transition="condition_in")
        pp = PackedUNetModified2(net).pack(params)
        key = jax.random.PRNGKey(7)
        ref = np.asarray(jax.jit(base.infer)(params, key, cond))
        got = np.asarray(jax.jit(fast.infer)(pp, key, cond))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    def test_in_fewstep_samplers(self, setup):
        """Packed == plain through the RECOMMENDED serving configs:
        subsampled ancestral (--steps) and DDIM — same keys, same
        schedule subsequence, elementwise-equal outputs."""
        from sddm_tpu.diffusion import DiffusionSchedule
        from sddm_tpu.models import SDDM

        net, params, cond, x_t, lvl, _ = setup
        sched = DiffusionSchedule.create("linear", 6, 1e-6, 1e-3)
        pp = PackedUNetModified2(net).pack(params)
        key = jax.random.PRNGKey(11)
        for mk in (lambda m: m.with_sampling_steps(2),
                   lambda m: m.with_ddim().with_sampling_steps(2)):
            base = mk(SDDM(sched, net, p_transition="condition_in"))
            fast = mk(SDDM(sched, PackedUNetModified2(net),
                           p_transition="condition_in"))
            ref = np.asarray(jax.jit(base.infer)(params, key, cond))
            got = np.asarray(jax.jit(fast.infer)(pp, key, cond))
            np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
