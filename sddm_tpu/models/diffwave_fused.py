"""FusedDiffWave — inference engine running the residual stack as one
Pallas kernel (ops/pallas/diffwave_stack.py).

Drop-in inference twin of :class:`~sddm_tpu.models.diffwave.DiffWave`
(reference model/diffwave.py:111-155): same ``init``/``apply`` surface and
the SAME parameter tree, so trained checkpoints and torch imports load
unchanged.  Plug it into :class:`SDDM_spectrogram` in place of the flax
network for sampling; the ``prepare`` hook (models/sddm.py::SDDM._prepare)
re-stacks the per-layer weights once per infer call, outside the sampling
scan.

What changes vs the flax forward:
  - the 30 gated residual layers run inside ONE Pallas kernel with the
    signal VMEM-resident (the flax path materializes every per-layer
    intermediate in HBM — the measured sampler bottleneck);
  - the conditioner projections of all layers are computed as one einsum
    whose operands are loop-invariant, so XLA hoists the whole [L, B, T,
    2C] conditioner stack out of the sampling loop (verified: ablating the
    per-layer projection does not change flax step time — LICM already
    hoists it there too);
  - stem/head/upsampler/embedding reuse the flax modules on parameter
    subtrees (exact).

Inference-only: the Pallas kernel has no VJP; training keeps the flax
network.  Off-TPU (or when T is not a multiple of 128) the engine runs
``diffwave_stack_reference`` — the same stacked-weight math as a layer
scan — so outputs are backend-independent.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.pallas.diffwave_stack import (
    diffwave_stack,
    diffwave_stack_reference,
)
from .diffwave import DiffusionEmbedding, DiffWave, SpectrogramUpsampler


class FusedDiffWave:
    """Inference twin of a :class:`DiffWave` instance."""

    def __init__(self, net: DiffWave, use_kernel: bool = None,
                 interpret: bool = False):
        self.net = net
        self.use_kernel = use_kernel  # None = auto: TPU backend
        self.interpret = interpret    # force kernel in interpret mode (tests)

    # registry/test parity with the flax module
    def init(self, key, *args, **kwargs):
        return self.net.init(key, *args, **kwargs)

    # -- engine hook (SDDM._prepare): stack per-layer weights once ---------
    def prepare(self, params):
        p = params["params"] if "params" in params else params
        L = self.net.residual_layers

        def st(name, idx=None):
            leaf = [p[f"ResidualBlock_{i}"][name] for i in range(L)]
            k = jnp.stack([x["kernel"] for x in leaf])
            b = jnp.stack([x["bias"] for x in leaf])
            return k, b

        wconv, bconv = st("Conv_0")                  # [L, 3, C, 2C], [L, 2C]
        wcond, bcond = st("Conv_1")                  # [L, 1, F, 2C], [L, 2C]
        wres, bres = st("Conv_2")                    # [L, 1, C, C]
        wskip, bskip = st("Conv_3")
        wemb, bemb = st("Dense_0")                   # [L, 512, C], [L, C]
        return {
            "wconv": wconv, "bconv": bconv,
            "wcond": wcond[:, 0], "bcond": bcond,    # [L, F, 2C]
            "wrs": jnp.concatenate([wres[:, 0], wskip[:, 0]], axis=-1),
            "brs": jnp.concatenate([bres, bskip], axis=-1)[:, None, :],
            "wemb": wemb, "bemb": bemb,
            "stem": p["Conv_0"],
            "head0": p["Conv_1"], "head1": p["Conv_2"],
            "emb": p["DiffusionEmbedding_0"],
            "upsampler": p["SpectrogramUpsampler_0"],
        }

    # -- engine hook (SDDM.infer): step-invariant condition work, once -----
    def prepare_condition(self, prep, condition, T: int = None):
        """Upsample the spectrogram and project it through every layer's
        conditioner conv (+ the dilated conv biases folded in) — all
        loop-invariant across sampler steps.  Returns the apply-ready
        context; called once per infer, OUTSIDE the sampling scan."""
        if "params" in prep:
            prep = self.prepare(prep)
        net = self.net
        dt = net.dtype
        if condition.ndim == 4:
            condition = condition[:, 0]
        spec_up = SpectrogramUpsampler(dtype=dt).apply(
            {"params": prep["upsampler"]}, condition.astype(jnp.float32))
        cond = jnp.swapaxes(spec_up, 1, 2).astype(dt)  # [B, T_up, F]
        if T is None:
            T = cond.shape[1]
        if cond.shape[1] < T:
            cond = jnp.pad(cond, ((0, 0), (0, T - cond.shape[1]), (0, 0)))
        cond = cond[:, :T, :]
        cond_l = jnp.einsum("btf,lfc->lbtc", cond, prep["wcond"].astype(dt))
        cond_l = cond_l + (prep["bcond"] + prep["bconv"]).astype(
            dt)[:, None, None, :]                     # [L, B, T, 2C]
        return {"cond_l": cond_l}

    # -- forward, SDDM network-apply signature ------------------------------
    def apply(self, prep, condition, x_t, diffusion_step,
              deterministic: bool = True, rngs=None):
        if "params" in prep:  # unprepared tree (direct apply, no hook)
            prep = self.prepare(prep)
        net = self.net
        dt = net.dtype
        C = net.residual_channels
        L = net.residual_layers

        audio = jnp.swapaxes(x_t, 1, 2).astype(dt)   # [B, T, 1]
        B, T, _ = audio.shape

        # stem (C_in=1 pointwise conv == broadcast multiply; models/diffwave
        # .py::Conv fast path)
        sk = prep["stem"]["kernel"].astype(dt)
        sb = prep["stem"]["bias"].astype(dt)
        x0 = jax.nn.relu(audio * sk[0, 0][None, None, :]
                         + sb[None, None, :])        # [B, T, C]

        # diffusion embedding chain (tiny, per step)
        emb512 = DiffusionEmbedding().apply(
            {"params": prep["emb"]},
            diffusion_step.reshape(-1).astype(dt))    # [B, 512]
        emb_d = jnp.einsum("be,lec->lbc", emb512,
                           prep["wemb"].astype(dt)) \
            + prep["bemb"].astype(dt)[:, None, :]     # [L, B, C]

        # conditioner stack: precomputed ctx from the prepare_condition
        # hook when sampling, else computed here (training-forward parity)
        if isinstance(condition, dict):
            cond_l = condition["cond_l"][:, :, :T]
        else:
            cond_l = self.prepare_condition(prep, condition, T)["cond_l"]

        wconv = prep["wconv"].astype(dt)
        wrs = prep["wrs"].astype(dt)
        brs = prep["brs"].astype(dt)

        use_kernel = self.use_kernel
        if use_kernel is None:
            use_kernel = (jax.default_backend() == "tpu" and T % 128 == 0)
        if use_kernel or self.interpret:
            skips = diffwave_stack(
                x0, cond_l, emb_d, wconv, wrs, brs,
                cycle=net.dilation_cycle_length, interpret=self.interpret)
        else:
            skips = diffwave_stack_reference(
                x0, cond_l, emb_d, wconv, wrs, brs,
                cycle=net.dilation_cycle_length)

        # head (reference diffwave.py:150-155)
        y = skips / math.sqrt(float(L))
        h0k = prep["head0"]["kernel"].astype(dt)     # [1, C, C]
        h0b = prep["head0"]["bias"].astype(dt)
        y = jax.nn.relu(jnp.einsum("btc,cf->btf", y, h0k[0]) + h0b)
        h1k = prep["head1"]["kernel"].astype(dt)     # [1, C, 1]
        h1b = prep["head1"]["bias"].astype(dt)
        y = jnp.einsum("btc,cf->btf", y, h1k[0]) + h1b
        return jnp.swapaxes(y, 1, 2).astype(x_t.dtype)  # [B, 1, T]
