"""SNR-adaptive per-segment diffusion schedule.

Behavioral parity target: reference ``VariableGaussianDiffusion``
(model/diffusion.py:329-446), which derives a per-(batch, segment) linear beta
ramp from an SNR estimate:  ``linear_end = (10**(snr/-20) / scale)**2``.

TPU-first redesign: the reference builds the ramp with a python loop over the
batch + a numpy linspace + ``.cpu()`` round-trips, re-executed inside EVERY
reverse step (model/diffusion.py:343-356, 371-389 — the perf cliff called out
in SURVEY.md §3.3).  Here the whole ``[B, 1, N, T+1]`` table is a single
broadcasted jnp expression computed ONCE per utterance inside jit, and the
reverse ``lax.scan`` just gathers slices of it.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class VariableSchedule:
    """Per-(batch, segment) tables, shape ``[B, 1, N, T+1]`` (index 0 pad)."""

    betas: jnp.ndarray
    alpha_bar: jnp.ndarray
    sqrt_alpha_bar: jnp.ndarray
    num_timesteps: int = struct.field(pytree_node=False, default=0)


def variable_tables(
    snr_estimate: jnp.ndarray,
    n_timestep: int,
    snr_estimate_scale: float = 100.0,
    linear_start: float = 1e-6,
) -> VariableSchedule:
    """Build per-segment schedule tables from an SNR estimate ``[B, N]``.

    Parity: ``VariableGaussianDiffusion.get_beta_schedule``
    (model/diffusion.py:343-356), fully vectorized.
    """
    # [B, N] per-segment ramp endpoint.  Clamped to a valid beta range:
    # the reference formula (model/diffusion.py:349) sends any estimated
    # segment SNR below -20*log10(scale) (= -40 dB at scale 100) to
    # linear_end > 1, making 1-beta negative and sqrt(cumprod) NaN —
    # unobserved on VoiceBank, immediate on corpora with silent/pure-noise
    # segments.  A <= -40 dB segment clamps to the maximal valid schedule
    # (beta 0.999), which is the design intent: all-noise segments get the
    # most aggressive noising.
    linear_end = (10.0 ** (snr_estimate / -20.0) / snr_estimate_scale) ** 2
    linear_end = jnp.clip(linear_end, linear_start, 0.999)
    # linspace(start, end, T) ramp along a new trailing axis: [B, N, T]
    ramp = jnp.linspace(0.0, 1.0, n_timestep, dtype=snr_estimate.dtype)
    betas_steps = linear_start + ramp[None, None, :] * (
        linear_end[..., None] - linear_start
    )
    zeros = jnp.zeros_like(betas_steps[..., :1])
    betas = jnp.concatenate([zeros, betas_steps], axis=-1)[:, None]  # [B,1,N,T+1]
    alpha_bar = jnp.cumprod(1.0 - betas, axis=-1)
    return VariableSchedule(
        betas=betas,
        alpha_bar=alpha_bar,
        sqrt_alpha_bar=jnp.sqrt(alpha_bar),
        num_timesteps=n_timestep,
    )


def p_transition(
    vsched: VariableSchedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    predicted: jnp.ndarray,
    key: jax.Array,
) -> jnp.ndarray:
    """Per-segment Ho-2020 reverse step (model/diffusion.py:371-389).

    ``x_t``/``predicted``: [B, 1, N, L]; coefficients gathered at step ``t``
    have shape [B, 1, N, 1] and broadcast over the frame axis.
    """
    betas_t = jax.lax.dynamic_index_in_dim(vsched.betas, t, axis=-1)
    ab_t = jax.lax.dynamic_index_in_dim(vsched.alpha_bar, t, axis=-1)
    ab_tm1 = jax.lax.dynamic_index_in_dim(vsched.alpha_bar, t - 1, axis=-1)

    mean = (x_t - betas_t / jnp.sqrt(1.0 - ab_t) * predicted) / jnp.sqrt(
        1.0 - betas_t
    )
    sigma = jnp.sqrt((1.0 - ab_tm1) / (1.0 - ab_t) * betas_t)
    noise = jax.random.normal(key, x_t.shape, x_t.dtype)
    gate = (t > 1).astype(x_t.dtype)
    return jnp.clip(mean + gate * sigma * noise, -1.0, 1.0)


def q_stochastic(
    vsched: VariableSchedule,
    x_0: jnp.ndarray,
    key: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Training forward process with a SINGLE step t shared across the batch
    (model/diffusion.py:392-418; integer-t only, as in the reference).

    Returns ``(x_t, noise, noise_level[B,1,N,1], t)``.
    """
    k_t, k_n = jax.random.split(key)
    t = jax.random.randint(k_t, (), 1, vsched.num_timesteps + 1)
    noise = jax.random.normal(k_n, x_0.shape, x_0.dtype)
    level = jax.lax.dynamic_index_in_dim(vsched.sqrt_alpha_bar, t, axis=-1)
    x_t = level * x_0 + jnp.sqrt(1.0 - jnp.square(level)) * noise
    return x_t, noise, level, t


def get_x_T(
    vsched: VariableSchedule, condition: jnp.ndarray, key: jax.Array
) -> jnp.ndarray:
    """Sampler init at t = T (model/diffusion.py:420-437)."""
    noise = jax.random.normal(key, condition.shape, condition.dtype)
    level = vsched.sqrt_alpha_bar[..., -1:]
    return level * condition + jnp.sqrt(1.0 - jnp.square(level)) * noise


def get_noise_level(vsched: VariableSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """sqrt_alpha_bar[..., t] as [B, 1, N, 1] (model/diffusion.py:440-446)."""
    return jax.lax.dynamic_index_in_dim(vsched.sqrt_alpha_bar, t, axis=-1)
