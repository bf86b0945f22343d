"""Fused DiffWave engine (Pallas residual-stack kernel) correctness.

The kernel (sddm_tpu/ops/pallas/diffwave_stack.py) runs all gated residual
layers (reference model/diffwave.py:64-108) in one pallas_call with the
signal VMEM-resident.  These tests pin, on CPU:

  - kernel (interpret mode) == pure-JAX stacked reference, across dilation
    regimes (small-d static-slice path, large-d aligned-dynamic path,
    mixed cycles, f32);
  - FusedDiffWave engine == the flax DiffWave forward, bit-for-bit in f32,
    through both the reference fallback and the interpret-mode kernel;
  - the FULL SDDM_spectrogram sampler with the engine plugged in (both
    prepare hooks exercised) == the plain-network sampler, same keys.

On-chip bf16 numerics are pinned separately in tools/zoo_rtf.py A/Bs
(PERFORMANCE.md): kernel-vs-plain deviation 0.047 max abs, smaller than the
plain bf16 path's own 0.064 deviation from f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sddm_tpu.diffusion import DiffusionSchedule
from sddm_tpu.models import DiffWave, FusedDiffWave, SDDM_spectrogram
from sddm_tpu.ops.pallas.diffwave_stack import (
    diffwave_stack,
    diffwave_stack_reference,
)


def _stack_args(B, T, C, L, key):
    shapes = [(B, T, C), (L, B, T, 2 * C), (L, B, C), (L, 3, C, 2 * C),
              (L, C, 2 * C), (L, 1, 2 * C)]
    return [0.3 * jax.random.normal(jax.random.fold_in(key, i), s)
            for i, s in enumerate(shapes)]


_slow = pytest.mark.slow  # interpret-mode compiles are CPU-heavy


class TestKernelVsReference:
    @pytest.mark.parametrize("cycle,L", [
        pytest.param(3, 7, marks=_slow),
        (5, 7),
        pytest.param(4, 12, marks=_slow),
        pytest.param(10, 11, marks=_slow),
    ])
    def test_interpret_matches_reference(self, cycle, L):
        # T=128 keeps the fast-tier (5,7) case ~2x cheaper while still
        # wrapping the dilation cycle (max dilation 2^6 = 64 < 128)
        args = _stack_args(2, 128, 8, L, jax.random.PRNGKey(L))
        want = diffwave_stack_reference(*args, cycle=cycle)
        got = diffwave_stack(*args, cycle=cycle, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.slow
    def test_reference_matches_flax_layers(self):
        # the stacked reference == a loop over flax ResidualBlock modules
        import math

        from flax import linen as nn

        import sddm_tpu.models.diffwave as dw

        B, T, C, L, cycle, freq = 2, 192, 8, 5, 3, 16

        class Stack(nn.Module):
            @nn.compact
            def __call__(self, x, cond, emb):
                skips = None
                for i in range(L):
                    x, skip = dw.ResidualBlock(C, 2 ** (i % cycle))(
                        x, cond, emb)
                    skips = skip if skips is None else skips + skip
                return skips

        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (B, T, C))
        cond_raw = jax.random.normal(jax.random.fold_in(key, 1),
                                     (B, T, freq))
        emb = jax.random.normal(jax.random.fold_in(key, 2), (B, 512))
        stack = Stack()
        p = stack.init(jax.random.fold_in(key, 3), x0, cond_raw, emb)
        want = stack.apply(p, x0, cond_raw, emb)

        pp = p["params"]
        wconv = jnp.stack([pp[f"ResidualBlock_{i}"]["Conv_0"]["kernel"]
                           for i in range(L)])
        bconv = jnp.stack([pp[f"ResidualBlock_{i}"]["Conv_0"]["bias"]
                           for i in range(L)])
        wcond = jnp.stack([pp[f"ResidualBlock_{i}"]["Conv_1"]["kernel"][0]
                           for i in range(L)])
        bcond = jnp.stack([pp[f"ResidualBlock_{i}"]["Conv_1"]["bias"]
                           for i in range(L)])
        wrs = jnp.stack([jnp.concatenate(
            [pp[f"ResidualBlock_{i}"]["Conv_2"]["kernel"][0],
             pp[f"ResidualBlock_{i}"]["Conv_3"]["kernel"][0]], axis=1)
            for i in range(L)])
        brs = jnp.stack([jnp.concatenate(
            [pp[f"ResidualBlock_{i}"]["Conv_2"]["bias"],
             pp[f"ResidualBlock_{i}"]["Conv_3"]["bias"]])
            for i in range(L)])[:, None, :]
        emb_d = jnp.stack(
            [emb @ pp[f"ResidualBlock_{i}"]["Dense_0"]["kernel"]
             + pp[f"ResidualBlock_{i}"]["Dense_0"]["bias"]
             for i in range(L)])
        cond = jnp.stack(
            [jnp.einsum("btf,fc->btc", cond_raw, wcond[i]) + bcond[i]
             + bconv[i] for i in range(L)])

        got = diffwave_stack_reference(x0, cond, emb_d, wconv, wrs, brs,
                                       cycle=cycle)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


class TestFusedEngine:
    def _setup(self):
        B, freq, frames, hop = 2, 17, 8, 16   # T = 128
        net = DiffWave(freq_bins=freq, residual_channels=8,
                       residual_layers=7, dilation_cycle_length=3)
        sched = DiffusionSchedule.create("linear", 5, 1e-4, 0.02)
        model = SDDM_spectrogram(sched, net, hop_samples=hop,
                                 noise_condition="time_step")
        spec = 0.3 * jax.random.normal(jax.random.PRNGKey(1),
                                       (B, freq, frames))
        params = model.init(jax.random.PRNGKey(0), spec.shape)
        T = hop * frames
        x_t = jax.random.normal(jax.random.PRNGKey(2), (B, 1, T))
        t = jnp.full((B, 1, 1), 3.0)
        return net, sched, model, spec, params, x_t, t, hop

    @pytest.mark.slow  # covered end-to-end by test_full_sampler_matches_plain
    def test_apply_matches_flax_reference_path(self):
        net, _, _, spec, params, x_t, t, _ = self._setup()
        want = net.apply(params, spec, x_t, t)
        got = FusedDiffWave(net, use_kernel=False).apply(params, spec, x_t, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.slow  # kernel math guarded in the fast tier by
    # TestKernelVsReference[5-7]; this engine-level interpret pass costs ~17 s
    def test_apply_matches_flax_kernel_interpret(self):
        net, _, _, spec, params, x_t, t, _ = self._setup()
        want = net.apply(params, spec, x_t, t)
        got = FusedDiffWave(net, interpret=True).apply(params, spec, x_t, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.slow  # compiles two full T-step samplers (~35 s CPU)
    def test_full_sampler_matches_plain(self):
        net, sched, model, spec, params, _, _, hop = self._setup()
        eng = FusedDiffWave(net, use_kernel=False)
        model_f = SDDM_spectrogram(sched, eng, hop_samples=hop,
                                   noise_condition="time_step")
        out_p = model.infer(params, jax.random.PRNGKey(5), spec)
        out_f = model_f.infer(params, jax.random.PRNGKey(5), spec)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                                   rtol=5e-4, atol=5e-4)

    def test_cli_packed_builds_fused_engine(self):
        from sddm_tpu.cli import build_network

        cfg = {"packed": True,
               "network": {"type": "DiffWave",
                           "args": {"freq_bins": 17, "residual_channels": 8,
                                    "residual_layers": 4,
                                    "dilation_cycle_length": 3}}}
        eng = build_network(cfg, role="infer")
        assert isinstance(eng, FusedDiffWave)
        # training keeps the plain (differentiable) network
        net = build_network(cfg, role="train")
        assert isinstance(net, DiffWave)
