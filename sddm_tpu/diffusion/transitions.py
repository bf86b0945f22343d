"""Pure-function q/p diffusion transitions.

Behavioral parity targets (reference model/diffusion.py):
  - ``p_transition``              :177-190  (Ho 2020 / WaveGrad reverse step)
  - ``p_transition_sr3``          :164-175  (noise std sqrt(beta_t))
  - ``p_transition_supportive``   :192-209  (Lu et al 2021 blend with condition)
  - ``p_transition_conditional``  :211-223  (CDiffuSE reverse mean)
  - ``q_stochastic``              :225-251  (continuous noise-level forward)
  - ``q_stochastic_conditional``  :253-279
  - ``get_x_T`` / ``get_x_T_conditional`` :281-320

TPU-first design: every function is a pure jnp function of
``(schedule, arrays, t, key)`` — branchless (the "add noise only for t > 1"
python branch becomes a multiplicative mask), statically shaped, and safe to
call inside ``jax.lax.scan``.  ``t`` may be a traced scalar (reverse sampling)
or a ``[B]`` vector (training); coefficient lookups are single gathers into
the constant ``[T+1]`` tables.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .schedule import DiffusionSchedule, broadcast_to_batch


def _clip(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, -1.0, 1.0)


def _noise_gate(t: jnp.ndarray, dtype) -> jnp.ndarray:
    """1.0 where t > 1 (noise is added), else 0.0 — replaces the reference's
    python ``if t > 1`` branch (model/diffusion.py:186) branchlessly."""
    return (t > 1).astype(dtype)


# --------------------------------------------------------------------------
# Reverse (p) transitions.  t is a scalar step index in [1, T].
# --------------------------------------------------------------------------

def p_transition(
    sched: DiffusionSchedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    predicted: jnp.ndarray,
    key: jax.Array,
    noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Ho-2020/WaveGrad reverse step (reference model/diffusion.py:177-190).

    ``noise`` (optional) injects a pre-drawn N(0,1) sample instead of drawing
    from ``key`` — used by the end-to-end sampler output-parity tests to share
    one noise stream with the torch reference."""
    mean = (x_t - sched.predicted_noise_coeff[t] * predicted) / jnp.sqrt(
        sched.alphas[t]
    )
    if noise is None:
        noise = jax.random.normal(key, x_t.shape, x_t.dtype)
    x_t_1 = mean + _noise_gate(t, x_t.dtype) * sched.sigma[t] * noise
    return _clip(x_t_1)


def p_transition_sr3(
    sched: DiffusionSchedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    predicted: jnp.ndarray,
    key: jax.Array,
    noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """SR3 variant: same mean, noise std sqrt(beta_t) (model/diffusion.py:164-175)."""
    mean = (x_t - sched.predicted_noise_coeff[t] * predicted) / jnp.sqrt(
        sched.alphas[t]
    )
    if noise is None:
        noise = jax.random.normal(key, x_t.shape, x_t.dtype)
    x_t_1 = mean + _noise_gate(t, x_t.dtype) * jnp.sqrt(sched.betas[t]) * noise
    return _clip(x_t_1)


def p_transition_supportive(
    sched: DiffusionSchedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    predicted: jnp.ndarray,
    condition: jnp.ndarray,
    key: jax.Array,
    noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Lu et al 2021 supportive reverse step (model/diffusion.py:192-209)."""
    gamma = sched.supportive_gamma[t]
    mu_t = x_t - sched.predicted_noise_coeff[t] * predicted
    x_t_1 = ((1.0 - gamma) * mu_t + gamma * condition) / jnp.sqrt(sched.alphas[t])
    if noise is None:
        noise = jax.random.normal(key, x_t.shape, x_t.dtype)
    sigma_hat = jnp.maximum(0.0, sched.supportive_sigma_hat[t])
    x_t_1 = x_t_1 + _noise_gate(t, x_t.dtype) * sigma_hat * noise
    return _clip(x_t_1)


def p_transition_conditional(
    sched: DiffusionSchedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    predicted: jnp.ndarray,
    condition: jnp.ndarray,
    key: jax.Array,
    noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """CDiffuSE-style conditional reverse step (model/diffusion.py:211-223)."""
    mean = (
        sched.c_xt[t] * x_t
        + sched.c_yt[t] * condition
        - sched.c_epst[t] * predicted
    )
    if noise is None:
        noise = jax.random.normal(key, x_t.shape, x_t.dtype)
    x_t_1 = mean + _noise_gate(t, x_t.dtype) * sched.sqrt_delta_estimated[t] * noise
    return _clip(x_t_1)


def p_transition_ddim(
    sched: DiffusionSchedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    predicted: jnp.ndarray,
    key: jax.Array,
    noise: jnp.ndarray | None = None,
    eta: float = 0.0,
) -> jnp.ndarray:
    """DDIM reverse step (Song et al. 2021) — TPU-era extension beyond the
    reference (which only ships ancestral samplers, model/diffusion.py).

    x0_hat = (x_t - sqrt(1-ab_t) eps_hat) / sqrt(ab_t)
    x_{t-1} = sqrt(ab_{t-1}) x0_hat + sqrt(1-ab_{t-1}-sigma^2) eps_hat
              + sigma z,   sigma = eta sqrt((1-ab_{t-1})/(1-ab_t))
                                       sqrt(1 - ab_t/ab_{t-1})

    ``eta=0`` is the deterministic DDIM ODE step (no PRNG consumed in the
    update); ``eta=1`` recovers DDPM-like variance.  The table convention
    (index 0 is the zero-step pad with alpha_bar=1) makes ``t-1`` lookups
    exact at t=1: ab_0=1 gives x_0 = x0_hat with zero noise, branchlessly.
    Composes with ``subsample_schedule`` for few-step sampling.  The output
    clamp matches this module's other transitions (reference clamps every
    x_{t-1} to [-1, 1])."""
    ab_t = sched.alpha_bar[t]
    ab_prev = sched.alpha_bar[t - 1]
    x0_hat = (x_t - jnp.sqrt(1.0 - ab_t) * predicted) / jnp.sqrt(ab_t)
    sigma = eta * jnp.sqrt(
        jnp.maximum((1.0 - ab_prev) / (1.0 - ab_t), 0.0)
    ) * jnp.sqrt(jnp.maximum(1.0 - ab_t / ab_prev, 0.0))
    dir_coeff = jnp.sqrt(jnp.maximum(1.0 - ab_prev - jnp.square(sigma), 0.0))
    x_t_1 = jnp.sqrt(ab_prev) * x0_hat + dir_coeff * predicted
    if eta != 0.0:
        if noise is None:
            noise = jax.random.normal(key, x_t.shape, x_t.dtype)
        x_t_1 = x_t_1 + _noise_gate(t, x_t.dtype) * sigma * noise
    return _clip(x_t_1)


def p_transition_ddim_conditional(
    sched: DiffusionSchedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    predicted: jnp.ndarray,
    condition: jnp.ndarray,
    key: jax.Array,
    noise: jnp.ndarray | None = None,
    eta: float = 0.0,
) -> jnp.ndarray:
    """DDIM-style deterministic reverse step for the CONDITIONAL
    (CDiffuSE-style) diffusion — TPU-era extension; neither the reference
    nor the CDiffuSE paper defines a few-step conditional sampler.

    The conditional forward (q_stochastic_conditional, reference
    model/diffusion.py:253-279) trains the network on the COMBINED noise
    c with   x_t = sqrt(ab_t) x0 + sqrt(1-ab_t) c,   so the DDIM
    x0-closure survives verbatim:

      x0_hat  = (x_t - sqrt(1-ab_t) c_hat) / sqrt(ab_t)
      eps_hat = (sqrt(1-ab_t) c_hat - m_t sqrt(ab_t) (y - x0_hat))
                / sqrt(delta_t)                  (the Gaussian component)
      x_{t-1} = (1-m_{t-1}) sqrt(ab_{t-1}) x0_hat
                + m_{t-1} sqrt(ab_{t-1}) y
                + sqrt(delta_{t-1} - sigma^2) eps_hat + sigma z,
      sigma   = eta sqrt(delta_estimated_t)   (the ancestral conditional
                posterior std, so eta=1 recovers its variance; eta=0 is
                the deterministic ODE-like step).

    Index-0 pads make t=1 exact: ab_0=1, m_0=0, delta_0=0 collapse the
    update to x_0 = x0_hat with the direction and noise terms at exactly
    zero (eps_hat stays finite via the delta_t floor).  Under a perfect
    predictor the whole chain is an identity on x0 — asserted by the
    oracle-chain test (tests/test_ddim.py).  Composes with
    ``subsample_schedule`` (m and delta are functions of alpha_bar alone,
    so subsampled tables equal the original tables at the kept steps)."""
    ab_t = sched.alpha_bar[t]
    sab_t = sched.sqrt_alpha_bar[t]
    sab_p = sched.sqrt_alpha_bar[t - 1]
    m_t = sched.m[t]
    m_p = sched.m[t - 1]
    sd_t = sched.sqrt_delta[t]
    sd_p = sched.sqrt_delta[t - 1]

    c_scaled = jnp.sqrt(1.0 - ab_t) * predicted
    x0_hat = (x_t - c_scaled) / sab_t
    eps_hat = (c_scaled - m_t * sab_t * (condition - x0_hat)) / jnp.maximum(
        sd_t, jnp.asarray(1e-12, x_t.dtype)
    )
    sigma = eta * sched.sqrt_delta_estimated[t]
    dir_coeff = jnp.sqrt(jnp.maximum(jnp.square(sd_p) - jnp.square(sigma),
                                     0.0))
    x_t_1 = ((1.0 - m_p) * sab_p * x0_hat + m_p * sab_p * condition
             + dir_coeff * eps_hat)
    if eta != 0.0:
        if noise is None:
            noise = jax.random.normal(key, x_t.shape, x_t.dtype)
        x_t_1 = x_t_1 + _noise_gate(t, x_t.dtype) * sigma * noise
    return _clip(x_t_1)


# --------------------------------------------------------------------------
# Forward (q) transitions — training-time noising.
# --------------------------------------------------------------------------

def q_stochastic(
    sched: DiffusionSchedule,
    x_0: jnp.ndarray,
    key: jax.Array,
    t_is_integer: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """WaveGrad-style continuous-noise-level forward process.

    Per-example random step t ~ U{1..T}; unless ``t_is_integer``, the noise
    level is drawn continuously: sqrt_ab ~ U(sqrt_ab[t-1], sqrt_ab[t]).
    Returns ``(x_t, noise, noise_level[B,1,..], t + frac[B,1,..])``.
    Parity: reference model/diffusion.py:225-251 (the reference takes noise as
    an argument; here it is drawn from ``key`` and returned — it is the
    regression target, see reference model/model.py:37-48).
    """
    b = x_0.shape[0]
    k_t, k_u, k_n = jax.random.split(key, 3)
    t = jax.random.randint(k_t, (b,), 1, sched.num_timesteps + 1)
    noise = jax.random.normal(k_n, x_0.shape, x_0.dtype)
    if t_is_integer:
        level = sched.sqrt_alpha_bar[t]
        frac = jnp.zeros((b,), x_0.dtype)
    else:
        l_a = sched.sqrt_alpha_bar[t - 1]
        l_b = sched.sqrt_alpha_bar[t]
        frac = jax.random.uniform(k_u, (b,), x_0.dtype)
        level = l_a + frac * (l_b - l_a)
    level_b = broadcast_to_batch(level, x_0.ndim)
    x_t = level_b * x_0 + jnp.sqrt(1.0 - jnp.square(level_b)) * noise
    t_cont = broadcast_to_batch(t.astype(x_0.dtype) + frac, x_0.ndim)
    return x_t, noise, level_b, t_cont


def q_stochastic_conditional(
    sched: DiffusionSchedule,
    x_0: jnp.ndarray,
    y: jnp.ndarray,
    key: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Conditional forward process (model/diffusion.py:253-279).

    x_t = sqrt_ab[t]*x_0 + m[t]*sqrt_ab[t]*(y - x_0) + sqrt_delta[t]*eps.
    Returns ``(x_t, combined_noise, noise_level[B,1,..])`` where
    combined_noise = (noise_from_condition + gaussian) / sqrt(1 - ab[t]) is
    the regression target.
    """
    b = x_0.shape[0]
    k_t, k_n = jax.random.split(key)
    t = jax.random.randint(k_t, (b,), 1, sched.num_timesteps + 1)
    noise = jax.random.normal(k_n, x_0.shape, x_0.dtype)

    level = broadcast_to_batch(sched.sqrt_alpha_bar[t], x_0.ndim)
    sqrt_delta = broadcast_to_batch(sched.sqrt_delta[t], x_0.ndim)
    m_t = broadcast_to_batch(sched.m[t], x_0.ndim)
    alpha_bar = broadcast_to_batch(sched.alpha_bar[t], x_0.ndim)

    gaussian_noise = sqrt_delta * noise
    noise_from_condition = m_t * level * (y - x_0)
    x_t = level * x_0 + noise_from_condition + gaussian_noise
    combined_noise = (noise_from_condition + gaussian_noise) / jnp.sqrt(
        1.0 - alpha_bar
    )
    return x_t, combined_noise, level


# --------------------------------------------------------------------------
# Sampler initialization (x_T).
# --------------------------------------------------------------------------

def get_x_T(
    sched: DiffusionSchedule, condition: jnp.ndarray, key: jax.Array,
    noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """x_T = sqrt_ab[T]*y + sqrt(1 - ab[T])*eps (model/diffusion.py:281-300)."""
    if noise is None:
        noise = jax.random.normal(key, condition.shape, condition.dtype)
    level = sched.sqrt_alpha_bar[sched.num_timesteps]
    return level * condition + jnp.sqrt(1.0 - jnp.square(level)) * noise


def get_x_T_conditional(
    sched: DiffusionSchedule, condition: jnp.ndarray, key: jax.Array,
    noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """x_T = sqrt_ab[T]*y + sqrt_delta[T]*eps (model/diffusion.py:302-320)."""
    if noise is None:
        noise = jax.random.normal(key, condition.shape, condition.dtype)
    T = sched.num_timesteps
    return sched.sqrt_alpha_bar[T] * condition + sched.sqrt_delta[T] * noise


def get_noise_level(sched: DiffusionSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """Noise level = sqrt_alpha_bar[t] (model/diffusion.py:322-326)."""
    return sched.sqrt_alpha_bar[t]
