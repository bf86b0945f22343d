"""Diffusion noise-schedule tables.

Behavioral parity target: the buffer tables built by the reference's
``GaussianDiffusion`` (reference model/diffusion.py:49-161) and the standalone
``make_beta_schedule`` factory (model/diffusion.py:15-45).

TPU-first design: instead of an nn.Module holding registered buffers, the
schedule is a frozen pytree of ``jnp`` arrays computed ONCE on the host in
float64 (cumprod in float32 drifts at T=1000-2000) and cast to float32.  The
pytree is closed over by jitted functions, so every coefficient is a compile
time constant-folded HBM table; per-step lookups inside ``lax.scan`` are
single gathers with no host sync.

All per-step tables have length ``T + 1``: index 0 is a zero pad and valid
diffusion steps are ``1..T``, matching the reference's indexing convention.
"""

from __future__ import annotations

import math
import jax.numpy as jnp
import numpy as np
from flax import struct


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Standalone β-schedule factory (length-T arrays, float64).

    Parity: reference model/diffusion.py:15-45 (quad / linear / warmup10 /
    warmup50 / const / jsd / cosine).
    """
    if schedule == "quad":
        betas = (
            np.linspace(
                linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64
            )
            ** 2
        )
    elif schedule == "linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "warmup10":
        betas = _warmup_beta(linear_start, linear_end, n_timestep, 0.1)
    elif schedule == "warmup50":
        betas = _warmup_beta(linear_start, linear_end, n_timestep, 0.5)
    elif schedule == "const":
        betas = linear_end * np.ones(n_timestep, dtype=np.float64)
    elif schedule == "jsd":  # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(n_timestep, 1, n_timestep, dtype=np.float64)
    elif schedule == "cosine":
        timesteps = (
            np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        )
        f = np.cos(timesteps / (1 + cosine_s) * math.pi / 2) ** 2
        f = f / f[0]
        betas = np.clip(1 - f[1:] / f[:-1], a_min=None, a_max=0.999)
    else:
        raise NotImplementedError(schedule)
    return betas


def _warmup_beta(
    linear_start: float, linear_end: float, n_timestep: int, warmup_frac: float
) -> np.ndarray:
    betas = linear_end * np.ones(n_timestep, dtype=np.float64)
    warmup_time = int(n_timestep * warmup_frac)
    betas[:warmup_time] = np.linspace(
        linear_start, linear_end, warmup_time, dtype=np.float64
    )
    return betas


@struct.dataclass
class DiffusionSchedule:
    """All per-step coefficient tables, each of shape ``[T + 1]`` (index 0 pad).

    A pytree of jnp arrays — pass it into jitted train/sample steps; only
    ``num_timesteps`` is static metadata.
    """

    # q-process (reference model/diffusion.py:63-96)
    betas: jnp.ndarray
    alphas: jnp.ndarray
    alpha_bar: jnp.ndarray
    sqrt_alpha_bar: jnp.ndarray
    # p-process, original/sr3/supportive (model/diffusion.py:98-117)
    sigma: jnp.ndarray
    predicted_noise_coeff: jnp.ndarray
    supportive_gamma: jnp.ndarray
    supportive_sigma_hat: jnp.ndarray
    # conditional (CDiffuSE-style) coefficients (model/diffusion.py:119-161)
    m: jnp.ndarray
    sqrt_delta: jnp.ndarray
    c_xt: jnp.ndarray
    c_yt: jnp.ndarray
    c_epst: jnp.ndarray
    sqrt_delta_estimated: jnp.ndarray

    num_timesteps: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def create(
        cls,
        schedule: str = "linear",
        n_timestep: int = 1000,
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        dtype: jnp.dtype = jnp.float32,
    ) -> "DiffusionSchedule":
        """Build all tables on host in float64, then cast.

        Parity: ``GaussianDiffusion.__init__`` + ``calculate_p_coeffs`` +
        ``calculate_coeffs_conditional`` (reference model/diffusion.py:49-161).
        Only ``linear`` / ``quad`` / ``cosine`` are supported here, as in the
        reference class (the other schedules exist via make_beta_schedule).
        """
        T = n_timestep
        betas = np.zeros(T + 1, dtype=np.float64)
        if schedule == "linear":
            betas[1:] = np.linspace(linear_start, linear_end, T, dtype=np.float64)
            alpha_bar = np.cumprod(1.0 - betas)
        elif schedule == "quad":
            betas[1:] = (
                np.linspace(linear_start**0.5, linear_end**0.5, T, dtype=np.float64)
                ** 2
            )
            alpha_bar = np.cumprod(1.0 - betas)
        elif schedule == "cosine":
            cosine_s = 0.008
            timesteps = np.arange(T + 1, dtype=np.float64) / T + cosine_s
            f = np.cos(timesteps / (1 + cosine_s) * (math.pi / 2)) ** 2
            # alpha_bar is set directly from the cosine curve; betas derived
            # from its ratio and clamped WITHOUT recomputing alpha_bar — this
            # matches the reference ordering (model/diffusion.py:74-82).
            alpha_bar = f / f[0]
            betas[1:] = 1.0 - alpha_bar[1:] / alpha_bar[:-1]
            betas = np.clip(betas, a_min=None, a_max=0.999)
        else:
            raise NotImplementedError(schedule)

        tables = _tables_from_alpha_bar(alpha_bar, betas=betas)
        as_jnp = lambda x: jnp.asarray(x, dtype=dtype)
        return cls(
            **{k: as_jnp(v) for k, v in tables.items()},
            num_timesteps=T,
        )


def broadcast_to_batch(values: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Reshape a ``[B]`` per-example vector to ``[B, 1, ..., 1]`` (ndim dims)."""
    return values.reshape(values.shape[:1] + (1,) * (ndim - 1))


def _tables_from_alpha_bar(alpha_bar: np.ndarray,
                           betas: np.ndarray | None = None) -> dict:
    """Derive every coefficient table from a (T+1)-length alpha_bar sequence
    (index 0 == 1.0).  Shared by ``create`` and ``subsample_schedule`` — the
    closed forms are exactly model/diffusion.py:98-161.

    ``betas`` may be supplied when the schedule defines it directly (linear /
    quad: the linspace itself; cosine: the clipped ratio) so the table is
    bit-identical to the reference rather than re-derived from alpha_bar
    ratios (which differ in the last float64 ulp)."""
    if betas is None:
        betas = np.zeros_like(alpha_bar)
        betas[1:] = 1.0 - alpha_bar[1:] / alpha_bar[:-1]
    alphas = 1.0 - betas
    sqrt_alpha_bar = np.sqrt(alpha_bar)

    sigma = np.zeros_like(betas)
    sigma[1:] = (
        (1.0 - alpha_bar[:-1]) / (1.0 - alpha_bar[1:]) * betas[1:]
    ) ** 0.5
    predicted_noise_coeff = np.zeros_like(betas)
    predicted_noise_coeff[1:] = betas[1:] / np.sqrt(1.0 - alpha_bar[1:])

    supportive_gamma = np.zeros_like(betas)
    supportive_gamma[1] = 0.2
    supportive_gamma[2:] = sigma[2:]
    supportive_sigma_hat = np.zeros_like(betas)
    supportive_sigma_hat[1:] = sigma[1:] - supportive_gamma[1:] / np.sqrt(
        alphas[1:]
    )

    m = np.sqrt((1.0 - alpha_bar) / sqrt_alpha_bar)
    delta = (1.0 - alpha_bar) - m**2 * alpha_bar
    one_minus_m_ratio = (1.0 - m[1:]) / (1.0 - m[:-1])
    alpha_t_delta_t_1 = alphas[1:] * delta[:-1]
    delta_t_given_t_1 = delta[1:] - one_minus_m_ratio**2 * alpha_t_delta_t_1
    sqrt_alphas = np.sqrt(alphas[1:])

    c_xt = np.zeros_like(betas)
    c_xt[1:] = one_minus_m_ratio * delta[:-1] / delta[1:] * sqrt_alphas + (
        1.0 - m[:-1]
    ) * (delta_t_given_t_1 / delta[1:]) * (1.0 / sqrt_alphas)
    c_yt = np.zeros_like(betas)
    c_yt[1:] = (
        (m[:-1] * delta[1:] - m[1:] * one_minus_m_ratio * alpha_t_delta_t_1)
        * sqrt_alpha_bar[:-1]
        / delta[1:]
    )
    c_epst = np.zeros_like(betas)
    c_epst[1:] = (
        (1.0 - m[:-1])
        * delta_t_given_t_1
        / delta[1:]
        * np.sqrt(1.0 - alpha_bar[1:])
        / sqrt_alphas
    )
    delta_estimated = np.zeros_like(betas)
    delta_estimated[1:] = delta_t_given_t_1 * delta[:-1] / delta[1:]

    with np.errstate(invalid="ignore"):
        sqrt_delta = np.sqrt(delta)
        sqrt_delta_est = np.sqrt(delta_estimated)
    return dict(
        betas=betas,
        alphas=alphas,
        alpha_bar=alpha_bar,
        sqrt_alpha_bar=sqrt_alpha_bar,
        sigma=sigma,
        predicted_noise_coeff=predicted_noise_coeff,
        supportive_gamma=supportive_gamma,
        supportive_sigma_hat=supportive_sigma_hat,
        m=m,
        sqrt_delta=sqrt_delta,
        c_xt=c_xt,
        c_yt=c_yt,
        c_epst=c_epst,
        sqrt_delta_estimated=sqrt_delta_est,
    )


def subsample_schedule(
    sched: "DiffusionSchedule", num_steps: int
):
    """Fast sampling: build a ``num_steps``-step schedule whose alpha_bar is
    a subsequence of the trained schedule's (DDPM-subsequence ancestral
    sampling).  The denoiser still receives the ORIGINAL noise levels
    (sqrt_alpha_bar values it was trained on); only the reverse-step
    coefficients change.  A TPU-era extension beyond the reference (its
    sampler always runs all T steps).

    Returns ``(schedule, t_map)`` where ``t_map[k]`` is the ORIGINAL step
    index the k-th subsampled step corresponds to (index 0 pads with 0) —
    needed by time_step-conditioned denoisers."""
    T = sched.num_timesteps
    if not (1 <= num_steps <= T):
        raise ValueError(f"num_steps must be in [1, {T}]")
    # evenly spaced subsequence ending at T (always includes the last step)
    ts = np.linspace(T / num_steps, T, num_steps)
    ts = np.unique(np.round(ts).astype(int))
    ab_full = np.asarray(sched.alpha_bar, dtype=np.float64)
    ab = np.concatenate([[1.0], ab_full[ts]])
    tables = _tables_from_alpha_bar(ab)
    as_jnp = lambda x: jnp.asarray(x, dtype=sched.betas.dtype)
    sub = DiffusionSchedule(
        **{k: as_jnp(v) for k, v in tables.items()},
        num_timesteps=len(ts),
    )
    t_map = jnp.asarray(np.concatenate([[0], ts]), jnp.int32)
    return sub, t_map


# Registry-friendly constructor matching the reference's config schema
# ("diffusion": {"type": "GaussianDiffusion", "args": {...}}).
def GaussianDiffusion(
    schedule: str = "linear",
    n_timestep: int = 1000,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    **_unused,
) -> DiffusionSchedule:
    return DiffusionSchedule.create(
        schedule=schedule,
        n_timestep=n_timestep,
        linear_start=linear_start,
        linear_end=linear_end,
    )
