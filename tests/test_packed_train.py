"""Differentiable (traced) packing and the packed TRAINING engine.

The packed inference engine (models/unet_packed.py) is exact by
tests/test_packed_model.py; these tests cover the training twin: traced
kernel transforms equal the host-side ones, the packed forward's loss and
PER-PARAMETER GRADIENTS equal the plain flax model's, and the CLI wiring
(``"packed": true``) produces the engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sddm_tpu.diffusion import DiffusionSchedule
from sddm_tpu.models import SDDM, UNetModified2
from sddm_tpu.models.losses import l1_loss
from sddm_tpu.models.unet_packed import (
    PackedTrainUNetModified2,
    PackedUNetModified2,
)
from sddm_tpu.ops.packed import (
    pack_kernel_s1,
    pack_kernel_s1_from_offset,
    pack_kernel_s1_to_offset,
    pack_kernel_s2_packed_out,
    pack_kernel_s2_unpacked_out,
    pack_kernel_traced,
    pack_kernel_upsample,
)

NS = 72


def tiny_net():
    return UNetModified2(
        num_samples=NS, inner_channel=8, norm_groups=4, channel_mults=(1, 2),
        res_blocks=1, segment_len=16, segment_stride=8,
    )


def tiny_setup():
    net = tiny_net()
    sched = DiffusionSchedule.create("linear", 3, 1e-6, 1e-3)
    base = SDDM(sched, net, p_transition="condition_in")
    params = base.init(jax.random.PRNGKey(0), (2, 1, NS))
    return net, sched, base, params


class TestTracedKernelPacking:
    @pytest.mark.parametrize("kind,builder,shape", [
        ("s1", pack_kernel_s1, (3, 3, 6, 10)),
        ("s1", pack_kernel_s1, (1, 1, 6, 10)),
        ("s2u", pack_kernel_s2_unpacked_out, (3, 3, 6, 10)),
        ("s2p", pack_kernel_s2_packed_out, (3, 3, 6, 10)),
        ("up", pack_kernel_upsample, (3, 3, 6, 10)),
    ])
    def test_matches_host_builder(self, kind, builder, shape):
        w = np.random.RandomState(0).randn(*shape).astype(np.float32)
        ref = builder(w)
        got = np.asarray(pack_kernel_traced(kind, jnp.asarray(w)))
        np.testing.assert_array_equal(ref, got)

    @pytest.mark.slow  # jits the full packing graph on CPU
    def test_pack_traced_tree_equals_pack(self):
        net, _sched, _base, params = tiny_setup()
        eng = PackedUNetModified2(net)
        host = jax.tree_util.tree_leaves(eng.pack(params))
        traced = jax.tree_util.tree_leaves(jax.jit(eng.pack_traced)(params))
        assert len(host) == len(traced)
        for a, b in zip(host, traced):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestBlockKernelPacking:
    """Gather-free (slice+concat) packing == the host/gather paths —
    the round-4 axon-miscompute A/B implementation (SDDM_PACK_IMPL=blocks)."""

    @pytest.mark.parametrize("kind,builder,shape", [
        ("s1", pack_kernel_s1, (3, 3, 6, 10)),
        ("s1", pack_kernel_s1, (1, 1, 6, 10)),
        ("s1to", pack_kernel_s1_to_offset, (3, 3, 6, 10)),
        ("s1from", pack_kernel_s1_from_offset, (3, 3, 6, 10)),
        ("s2u", pack_kernel_s2_unpacked_out, (3, 3, 6, 10)),
        ("s2p", pack_kernel_s2_packed_out, (3, 3, 6, 10)),
        ("up", pack_kernel_upsample, (3, 3, 6, 10)),
    ])
    def test_matches_host_builder(self, kind, builder, shape):
        from sddm_tpu.ops.packed import pack_kernel_blocks

        w = np.random.RandomState(0).randn(*shape).astype(np.float32)
        ref = builder(w)
        got = np.asarray(pack_kernel_blocks(kind, jnp.asarray(w)))
        np.testing.assert_array_equal(ref, got)

    def test_onehot_reorders_exact(self):
        from sddm_tpu.ops.packed import onehot_take, onehot_unperm_axis2

        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(24).astype(np.float32))
        idx = rng.permutation(24)[:17]
        np.testing.assert_array_equal(
            np.asarray(onehot_take(x, idx)), np.asarray(x)[idx])
        w = jnp.asarray(rng.randn(3, 3, 8, 5).astype(np.float32))
        perm = rng.permutation(8)
        np.testing.assert_array_equal(
            np.asarray(onehot_unperm_axis2(w, perm)),
            np.asarray(jnp.take(w, np.argsort(perm), axis=2)))

    @pytest.mark.slow  # jits the full packing graph on CPU
    def test_blocks_pack_tree_equals_pack(self, monkeypatch):
        monkeypatch.setenv("SDDM_PACK_IMPL", "blocks")
        net, _sched, _base, params = tiny_setup()
        eng = PackedUNetModified2(net)
        host = jax.tree_util.tree_leaves(eng.pack(params))
        traced = jax.tree_util.tree_leaves(jax.jit(eng.pack_traced)(params))
        assert len(host) == len(traced)
        for a, b in zip(host, traced):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.slow  # compiles the packing HLO twice
    def test_blocks_graph_has_no_gathers(self, monkeypatch):
        """The point of the formulation: the lowered packing program must
        contain no gather/scatter/dynamic-slice-with-traced-start ops."""
        net, _sched, _base, params = tiny_setup()
        eng = PackedUNetModified2(net)
        monkeypatch.setenv("SDDM_PACK_IMPL", "blocks")
        txt = jax.jit(eng.pack_traced).lower(params).as_text()
        assert "stablehlo.gather" not in txt, (
            "gather-free packing graph still lowers gather ops")
        assert "stablehlo.scatter" not in txt, (
            "gather-free packing graph still lowers scatter ops")
        monkeypatch.setenv("SDDM_PACK_IMPL", "gather")
        txt_g = jax.jit(eng.pack_traced).lower(params).as_text()
        assert "stablehlo.gather" in txt_g  # sanity: default path gathers


class TestPackedTrainEngine:
    @pytest.mark.slow  # compiles value_and_grad of both models
    def test_loss_and_grads_match_plain_model(self):
        net, sched, base, params = tiny_setup()
        tmodel = SDDM(sched, PackedTrainUNetModified2(net),
                      p_transition="condition_in")
        key = jax.random.PRNGKey(5)
        rng = np.random.default_rng(0)
        target = jnp.asarray(rng.normal(size=(2, 1, NS)) * 0.1, jnp.float32)
        cond = target + 0.02

        def make_loss(model):
            def f(p):
                pred, noise = model.forward(p, key, target, cond)
                return l1_loss(pred, noise)
            return f

        l1v, g1 = jax.value_and_grad(make_loss(base))(params)
        l2v, g2 = jax.value_and_grad(make_loss(tmodel))(params)
        assert abs(float(l1v) - float(l2v)) < 1e-6
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-6
            ),
            g1, g2,
        )

    @pytest.mark.slow  # compiles value_and_grad of both models
    def test_blocks_impl_loss_and_grads_match_plain(self, monkeypatch):
        """Same grad parity through the gather-free packing (the miscompute
        A/B candidate must be exactly the same training math)."""
        monkeypatch.setenv("SDDM_PACK_IMPL", "blocks")
        net, sched, base, params = tiny_setup()
        tmodel = SDDM(sched, PackedTrainUNetModified2(net),
                      p_transition="condition_in")
        key = jax.random.PRNGKey(5)
        rng = np.random.default_rng(0)
        target = jnp.asarray(rng.normal(size=(2, 1, NS)) * 0.1, jnp.float32)
        cond = target + 0.02

        def make_loss(model):
            def f(p):
                pred, noise = model.forward(p, key, target, cond)
                return l1_loss(pred, noise)
            return f

        l1v, g1 = jax.value_and_grad(make_loss(base))(params)
        l2v, g2 = jax.value_and_grad(make_loss(tmodel))(params)
        assert abs(float(l1v) - float(l2v)) < 1e-6
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-6
            ),
            g1, g2,
        )

    @pytest.mark.slow  # ~30 s: init compiles the full flax module once
    def test_init_is_checkpoint_compatible(self):
        net, sched, base, params = tiny_setup()
        tmodel = SDDM(sched, PackedTrainUNetModified2(net),
                      p_transition="condition_in")
        p2 = tmodel.init(jax.random.PRNGKey(0), (2, 1, NS))
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(p2)


@pytest.mark.slow  # compiles two full samplers
class TestPackedTrainInfer:
    def test_infer_matches_plain_model(self):
        net, sched, base, params = tiny_setup()
        tmodel = SDDM(sched, PackedTrainUNetModified2(net),
                      p_transition="condition_in")
        key = jax.random.PRNGKey(7)
        cond = jnp.asarray(
            np.random.default_rng(1).normal(size=(2, 1, NS)) * 0.1,
            jnp.float32,
        )
        out_b = base.infer(params, key, cond)
        out_t = tmodel.infer(params, key, cond)
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_t),
                                   atol=1e-6)


class TestCliWiring:
    def test_packed_flag_wraps_network(self):
        from sddm_tpu.cli import build_network

        cfg = {
            "network": {"type": "UNetModified2",
                        "args": {"inner_channel": 8, "norm_groups": 4,
                                 "channel_mults": [1, 2], "res_blocks": 1,
                                 "dropout": 0, "segment_len": 16,
                                 "segment_stride": 8}},
            "packed": True,
        }
        net = build_network(cfg, num_samples=NS)
        assert isinstance(net, PackedTrainUNetModified2)

    def test_train_role_defaults_plain_and_env_opts_in(self, monkeypatch):
        # Historical axon NaN -> training defaults to the plain network;
        # the round-5 on-chip A/B (both impls finite) justifies an explicit
        # opt-in via SDDM_PACKED_TRAIN=1 (cli.py).
        from sddm_tpu.cli import build_network
        from sddm_tpu.models import UNetModified2

        cfg = {
            "network": {"type": "UNetModified2",
                        "args": {"inner_channel": 8, "norm_groups": 4,
                                 "channel_mults": [1, 2], "res_blocks": 1,
                                 "dropout": 0, "segment_len": 16,
                                 "segment_stride": 8}},
            "packed": True,
        }
        monkeypatch.delenv("SDDM_PACKED_TRAIN", raising=False)
        net = build_network(cfg, role="train", num_samples=NS)
        assert isinstance(net, UNetModified2)
        monkeypatch.setenv("SDDM_PACKED_TRAIN", "1")
        net = build_network(cfg, role="train", num_samples=NS)
        assert isinstance(net, PackedTrainUNetModified2)

    def test_packed_flag_rejects_dropout(self):
        from sddm_tpu.cli import build_network

        cfg = {
            "network": {"type": "UNetModified2",
                        "args": {"inner_channel": 8, "norm_groups": 4,
                                 "channel_mults": [1, 2], "res_blocks": 1,
                                 "dropout": 0.1, "segment_len": 16,
                                 "segment_stride": 8}},
            "packed": True,
        }
        with pytest.raises(ValueError):
            build_network(cfg, num_samples=NS)
