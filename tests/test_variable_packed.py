"""Packed engine for UNetModified2_VariableNoiseLevel
(models/unet_variable_packed.py): elementwise exactness vs the flax model,
traced-pack equality, gradient parity of the training twin, and the
SNR-composite integration (prepare hook hoists packing out of the scan).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sddm_tpu.models.unet_variable import UNetModified2_VariableNoiseLevel
from sddm_tpu.models.unet_variable_packed import (
    PackedTrainUNetVariable,
    PackedUNetVariable,
)

B, N, L = 2, 8, 16


def tiny_net(**kw):
    args = dict(inner_channel=8, norm_groups=4, channel_mults=(1, 2),
                res_blocks=1, dropout=0, noise_level_channel=8)
    args.update(kw)
    return UNetModified2_VariableNoiseLevel(**args)


def tiny_inputs():
    cond = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, 1, N, L))
    x_t = jax.random.normal(jax.random.PRNGKey(2), (B, 1, N, L))
    nl = jax.random.uniform(jax.random.PRNGKey(3), (B, 1, N, 1),
                            minval=0.3, maxval=0.9)
    return cond, x_t, nl


class TestExactness:
    # fast tier keeps levels=2 (full packing — the production configuration);
    # the partial-packing variants and the res_blocks=2 topology are slow-tier
    # (each costs 10-40 s of CPU eager dispatch and guards the same interleave
    # machinery)
    @pytest.mark.parametrize(
        "levels",
        [pytest.param(0, marks=pytest.mark.slow),
         pytest.param(1, marks=pytest.mark.slow), 2],
    )
    def test_matches_flax_model(self, levels):
        net = tiny_net()
        cond, x_t, nl = tiny_inputs()
        params = net.init(jax.random.PRNGKey(0), cond, x_t, nl)
        ref = net.apply(params, cond, x_t, nl)
        eng = PackedUNetVariable(net, packed_levels=levels)
        got = eng.apply(eng.pack(params), cond, x_t, nl)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=5e-5)

    @pytest.mark.slow
    def test_res_blocks_2(self):
        net = tiny_net(res_blocks=2)
        cond, x_t, nl = tiny_inputs()
        params = net.init(jax.random.PRNGKey(0), cond, x_t, nl)
        ref = net.apply(params, cond, x_t, nl)
        eng = PackedUNetVariable(net)
        got = eng.apply(eng.pack(params), cond, x_t, nl)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=5e-5)

    def test_per_segment_noise_matters_in_packed(self):
        # distinct per-segment noise levels must produce distinct outputs —
        # guards the frame-parity interleave of the injection
        net = tiny_net()
        cond, x_t, nl = tiny_inputs()
        params = net.init(jax.random.PRNGKey(0), cond, x_t, nl)
        eng = PackedUNetVariable(net)
        pp = eng.pack(params)
        out_a = eng.apply(pp, cond, x_t, nl)
        nl2 = nl.at[:, :, 1].set(0.05)
        out_b = eng.apply(pp, cond, x_t, nl2)
        assert float(jnp.abs(out_a - out_b).max()) > 1e-4


@pytest.mark.slow  # jits the packing graph / grad graphs on CPU
class TestTraining:
    def test_pack_traced_equals_pack(self):
        net = tiny_net()
        cond, x_t, nl = tiny_inputs()
        params = net.init(jax.random.PRNGKey(0), cond, x_t, nl)
        eng = PackedUNetVariable(net)
        host = jax.tree_util.tree_leaves(eng.pack(params))
        traced = jax.tree_util.tree_leaves(jax.jit(eng.pack_traced)(params))
        assert len(host) == len(traced)
        for a, b in zip(host, traced):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_grads_match_flax_model(self):
        net = tiny_net()
        cond, x_t, nl = tiny_inputs()
        params = net.init(jax.random.PRNGKey(0), cond, x_t, nl)
        eng = PackedTrainUNetVariable(net)

        def loss_plain(p):
            return jnp.mean(jnp.abs(net.apply(p, cond, x_t, nl)))

        def loss_packed(p):
            return jnp.mean(jnp.abs(eng.apply(eng.prepare(p), cond, x_t, nl)))

        l1, g1 = jax.value_and_grad(loss_plain)(params)
        l2, g2 = jax.value_and_grad(loss_packed)(params)
        assert abs(float(l1) - float(l2)) < 1e-6
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-6
            ),
            g1, g2,
        )

    def test_init_checkpoint_compatible(self):
        net = tiny_net()
        cond, x_t, nl = tiny_inputs()
        params = net.init(jax.random.PRNGKey(0), cond, x_t, nl)
        eng = PackedTrainUNetVariable(net)
        p2 = eng.init(jax.random.PRNGKey(0), cond, x_t, nl)
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(p2)


class TestCliWiring:
    def test_packed_flag_wraps_variable_network(self):
        from sddm_tpu.cli import build_network

        cfg = {
            "network": {"type": "UNetModified2_VariableNoiseLevel",
                        "args": {"inner_channel": 8, "norm_groups": 4,
                                 "channel_mults": [1, 2], "res_blocks": 1,
                                 "dropout": 0, "noise_level_channel": 8}},
            "packed": True,
        }
        net = build_network(cfg)
        assert isinstance(net, PackedTrainUNetVariable)
