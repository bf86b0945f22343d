"""SDDM composite models: diffusion math + denoiser network.

Parity targets (reference model/model.py):
  - ``SDDM``                    :7-124   (train forward + T-step reverse infer)
  - ``SDDM_with_SNREstimator``  :128-203 (segment + frozen SNR estimator +
                                          per-segment variable schedule)
  - ``SDDM_spectrogram``        :206-257 (vocoder-style: condition is a
                                          spectrogram, x_T is pure noise)

TPU-first design: the reference's reverse loop is T sequential python
iterations, each a fresh kernel launch (model/model.py:106-124 — the hot loop
called out in SURVEY.md §3.2).  Here the full T-step sampler is ONE
``jax.lax.scan`` inside jit: the denoiser is traced once, every per-step
coefficient is a gather into constant tables, and the "add noise only when
t > 1" branch is a branchless mask.  Mode polymorphism (5 p-transitions x 2
noise conditionings x 2 q-transitions) is resolved statically at trace time
from config strings, so there is no retracing and no lax.switch overhead.

Composites are plain Python orchestrators over pure functions — parameters
are explicit pytrees (the functional JAX idiom), not module state.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..diffusion import transitions as tr
from ..diffusion import variable as var
from ..diffusion.schedule import DiffusionSchedule
from ..ops.framing import Segmentor

NOISE_CONDITIONS = ("sqrt_alpha_bar", "time_step")
P_TRANSITIONS = ("original", "supportive", "sr3", "conditional", "condition_in",
                 "ddim")
Q_TRANSITIONS = ("original", "conditional")


class SDDM:
    """Conditional diffusion speech-enhancement model (reference model/model.py:7-124)."""

    def __init__(
        self,
        diffusion: DiffusionSchedule,
        network: nn.Module,
        noise_condition: str = "sqrt_alpha_bar",
        p_transition: str = "original",
        q_transition: str = "original",
        ddim_eta: float = 0.0,
    ):
        if noise_condition not in NOISE_CONDITIONS:
            raise NotImplementedError(noise_condition)
        if p_transition not in P_TRANSITIONS:
            raise NotImplementedError(p_transition)
        if q_transition not in Q_TRANSITIONS:
            raise NotImplementedError(q_transition)
        self.diffusion = diffusion
        self.network = network
        self.num_timesteps = diffusion.num_timesteps
        self.noise_condition = noise_condition
        self.p_transition = p_transition
        self.q_transition = q_transition
        self.ddim_eta = float(ddim_eta)
        # set by with_sampling_steps: maps subsampled step index -> original
        # trained step index (needed for time_step conditioning)
        self._t_map = None

    def with_ddim(self, eta: float = 0.0) -> "SDDM":
        """Serving-time DDIM sampler (TPU-era extension beyond the
        reference): a copy of this model whose reverse step is the DDIM
        update (deterministic at ``eta=0``) on the same trained
        eps-predictor.  Initialization keeps the noised-condition start
        (``get_x_T``) so it is the fast drop-in for the flagship
        ``condition_in`` recipe; compose with ``with_sampling_steps`` for
        few-step enhancement.  With the CONDITIONAL q process
        (CDiffuSE-style combined-noise target) the reverse step is the
        conditional DDIM generalization
        (transitions.py::p_transition_ddim_conditional) and the chain
        keeps the conditional x_T prior."""
        import copy

        new = copy.copy(self)
        new.p_transition = (
            "ddim_conditional" if self.q_transition == "conditional"
            else "ddim"
        )
        new.ddim_eta = float(eta)
        return new

    def with_sampling_steps(self, num_steps: int) -> "SDDM":
        """Fast sampling: a copy of this model whose reverse sampler runs
        ``num_steps`` (<= T) steps over a subsequence of the trained
        schedule.  Training and the denoiser are untouched — the network
        still sees the original noise levels.  TPU-era extension beyond the
        reference's always-T sampler."""
        import copy

        from ..diffusion.schedule import subsample_schedule  # noqa: PLC0415

        new = copy.copy(self)
        new.diffusion, new._t_map = subsample_schedule(
            self.diffusion, num_steps
        )
        new.num_timesteps = new.diffusion.num_timesteps
        return new

    # -- parameter init ----------------------------------------------------
    def init(self, key: jax.Array, sample_shape: Tuple[int, ...]):
        dummy = jnp.zeros(sample_shape, jnp.float32)
        level = jnp.ones(sample_shape[:1] + (1,) * (len(sample_shape) - 1))
        return self.network.init(key, dummy, dummy, level)

    # -- training forward (reference model/model.py:29-48) -----------------
    def forward(
        self,
        params,
        key: jax.Array,
        target: jnp.ndarray,
        condition: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Sample the q process, predict the noise; returns ``(eps_hat, eps)``."""
        k_q, k_drop = jax.random.split(key)
        if self.q_transition == "original":
            x_t, noise, noise_level, t_cont = tr.q_stochastic(
                self.diffusion, target, k_q
            )
            cond_in = noise_level if self.noise_condition == "sqrt_alpha_bar" else t_cont
        else:  # conditional
            x_t, noise, noise_level = tr.q_stochastic_conditional(
                self.diffusion, target, condition, k_q
            )
            cond_in = noise_level
        predicted = self._apply(
            self._prepare(params), condition, x_t, cond_in, deterministic,
            k_drop,
        )
        return predicted, noise

    def _apply(self, params, condition, x_t, noise_level, deterministic, key=None):
        rngs = {"dropout": key} if (key is not None and not deterministic) else None
        return self.network.apply(
            params, condition, x_t, noise_level,
            deterministic=deterministic, rngs=rngs,
        )

    def _prepare(self, params):
        """Engine hook: networks exposing ``prepare`` (e.g. the packed
        training engine, models/unet_packed.py) re-derive their apply-time
        weight set ONCE per forward/infer call — outside the sampling scan."""
        prep = getattr(self.network, "prepare", None)
        return prep(params) if prep is not None else params

    # -- sampler init (reference model/model.py:57-68) ---------------------
    def _x_T(self, key: jax.Array, condition: jnp.ndarray, noise=None) -> jnp.ndarray:
        if self.p_transition in ("conditional", "ddim_conditional"):
            return tr.get_x_T_conditional(self.diffusion, condition, key, noise)
        if self.p_transition in ("condition_in", "ddim"):
            return tr.get_x_T(self.diffusion, condition, key, noise)
        if self.p_transition == "supportive":
            return condition
        if noise is not None:
            return noise
        return jax.random.normal(key, condition.shape, condition.dtype)

    # -- one reverse step, mode-resolved statically ------------------------
    def _reverse_step(self, params, condition, x_t, t, key, noise=None,
                      cond_ctx=None):
        # ``cond_ctx``: optional precomputed condition context from the
        # network's ``prepare_condition`` hook — used for the network
        # apply only; transitions keep the raw condition
        sched = self.diffusion
        if self.noise_condition == "sqrt_alpha_bar":
            nl = sched.sqrt_alpha_bar[t] * jnp.ones(
                condition.shape[:1] + (1,) * (condition.ndim - 1), condition.dtype
            )
        else:  # time_step
            t_orig = self._t_map[t] if self._t_map is not None else t
            nl = t_orig.astype(condition.dtype) * jnp.ones(
                condition.shape[:1] + (1,) * (condition.ndim - 1), condition.dtype
            )
        predicted = self._apply(
            params, condition if cond_ctx is None else cond_ctx, x_t, nl,
            True)
        if self.p_transition in ("original", "condition_in"):
            return tr.p_transition(sched, x_t, t, predicted, key, noise)
        if self.p_transition == "sr3":
            return tr.p_transition_sr3(sched, x_t, t, predicted, key, noise)
        if self.p_transition == "ddim":
            return tr.p_transition_ddim(
                sched, x_t, t, predicted, key, noise, eta=self.ddim_eta
            )
        if self.p_transition == "ddim_conditional":
            return tr.p_transition_ddim_conditional(
                sched, x_t, t, predicted, condition, key, noise,
                eta=self.ddim_eta,
            )
        if self.p_transition == "supportive":
            return tr.p_transition_supportive(
                sched, x_t, t, predicted, condition, key, noise
            )
        # conditional
        return tr.p_transition_conditional(
            sched, x_t, t, predicted, condition, key, noise
        )

    # -- full reverse sampler (reference model/model.py:51-124) ------------
    def infer(
        self,
        params,
        key: jax.Array,
        condition: jnp.ndarray,
        return_trajectory: bool = False,
        noise_stream=None,
    ) -> jnp.ndarray:
        """Run the full T-step reverse process as a single ``lax.scan``.

        ``return_trajectory=True`` additionally returns every intermediate
        state ``[T, B, ...]`` (the CLI subsamples every ``1 | (T // 100)``
        steps for parity with continuous sampling, model/model.py:79-103).

        ``noise_stream`` (optional) is ``(xT_noise, step_noises)`` with
        ``step_noises[i]`` the N(0,1) draw for step t = T - i; it replaces
        all in-sampler PRNG so the composed chain can be compared
        elementwise against the torch reference's ``model.infer`` driven by
        the same stream (tests/test_sampler_output_parity.py).
        """
        params = self._prepare(params)
        k_init, k_scan = jax.random.split(key)
        xT_noise, step_noises = (
            noise_stream if noise_stream is not None else (None, None)
        )
        x_T = self._x_T(k_init, condition, xT_noise)
        ts = jnp.arange(self.num_timesteps, 0, -1)

        # engine hook: networks exposing ``prepare_condition`` (e.g. the
        # fused DiffWave engine, models/diffwave_fused.py) precompute their
        # condition-derived, step-invariant work ONCE here — outside the
        # scan — instead of relying on XLA's loop-invariant code motion
        prep_cond = getattr(self.network, "prepare_condition", None)
        cond_ctx = (prep_cond(params, condition) if prep_cond is not None
                    else None)

        def step(carry, xs):
            t, nz = xs if step_noises is not None else (xs, None)
            x_t, k = carry
            k, sub = jax.random.split(k)
            x_next = self._reverse_step(params, condition, x_t, t, sub, nz,
                                        cond_ctx)
            return (x_next, k), (x_next if return_trajectory else None)

        xs = (ts, step_noises) if step_noises is not None else ts
        (x_0, _), traj = jax.lax.scan(step, (x_T, k_scan), xs)
        if return_trajectory:
            return x_0, traj
        return x_0

    def sample_interval(self) -> int:
        """Intermediate-sample stride: ``1 | (T // 100)`` (model/model.py:72)."""
        return 1 | (self.num_timesteps // 100)


class SDDM_spectrogram(SDDM):
    """Vocoder-style SDDM: condition is a spectrogram ``[B, freq, frames]``;
    sampling starts from pure noise of length ``hop_samples * n_frames``
    (reference model/model.py:206-257).

    TPU-native extension: with ``feature_fn`` set, the condition may be RAW
    AUDIO ``[B, 1, T]`` and the spectrogram is computed ON DEVICE inside the
    jitted train/sample step (host streams raw waveforms only — the
    north-star replacement for the offline prepare_spectrogram.py flow).
    """

    def __init__(
        self,
        diffusion: DiffusionSchedule,
        network: nn.Module,
        hop_samples: int,
        noise_condition: str = "sqrt_alpha_bar",
        feature_fn=None,
    ):
        super().__init__(diffusion, network, noise_condition)
        self.hop_samples = hop_samples
        self.feature_fn = feature_fn

    def _featurize(self, condition: jnp.ndarray) -> jnp.ndarray:
        if self.feature_fn is not None and condition.ndim == 3 and (
            condition.shape[1] == 1
        ):
            return self.feature_fn(condition)
        return condition

    def forward(self, params, key, target, condition, deterministic=True):
        return super().forward(
            params, key, target, self._featurize(condition), deterministic
        )

    def infer(self, params, key, condition, return_trajectory=False,
              noise_stream=None):
        return super().infer(
            params, key, self._featurize(condition), return_trajectory,
            noise_stream=noise_stream,
        )

    def init(self, key: jax.Array, spec_shape: Tuple[int, ...]):
        """``spec_shape`` is a spectrogram shape [B, freq, frames] — or a raw
        audio shape [B, 1, T] when ``feature_fn`` is set."""
        b = spec_shape[0]
        spec = self._featurize(jnp.zeros(spec_shape, jnp.float32))
        n_audio = self.hop_samples * spec.shape[-1]
        audio = jnp.zeros((b, 1, n_audio), jnp.float32)
        level = jnp.ones((b,) + (1,) * 2)
        return self.network.init(key, spec, audio, level)

    def _x_T(
        self, key: jax.Array, condition: jnp.ndarray, noise=None
    ) -> jnp.ndarray:
        # pure-noise start (reference model/model.py:227); ``noise`` injects a
        # pre-drawn sample for shared-stream parity tests like SDDM._x_T
        if noise is not None:
            return noise
        b = condition.shape[0]
        n = self.hop_samples * condition.shape[-1]
        return jax.random.normal(key, (b, 1, n))

    def _reverse_step(self, params, condition, x_t, t, key, noise=None,
                      cond_ctx=None):
        sched = self.diffusion
        shape = condition.shape[:1] + (1,) * (condition.ndim - 1)
        if self.noise_condition == "sqrt_alpha_bar":
            nl = sched.sqrt_alpha_bar[t] * jnp.ones(shape, x_t.dtype)
        else:
            t_orig = self._t_map[t] if self._t_map is not None else t
            nl = t_orig.astype(x_t.dtype) * jnp.ones(shape, x_t.dtype)
        predicted = self._apply(
            params, condition if cond_ctx is None else cond_ctx, x_t, nl,
            True)
        # spectrogram model uses the original transition
        # (model/model.py:239,255) — or DDIM after with_ddim() (few-step
        # vocoder serving; pure-noise x_T is the correct DDIM start here)
        if self.p_transition == "ddim":
            return tr.p_transition_ddim(
                sched, x_t, t, predicted, key, noise, eta=self.ddim_eta
            )
        return tr.p_transition(sched, x_t, t, predicted, key, noise)


class SDDM_with_SNREstimator:
    """Segment the signal, estimate per-segment SNR with a FROZEN estimator,
    and drive a per-segment variable schedule (reference model/model.py:128-203).

    Params are a dict ``{"network": ..., "snr_estimator": ...}``; only
    ``network`` is trained (the reference freezes the estimator,
    train_with_snr_estimator.py:48-52).
    """

    def __init__(
        self,
        diffusion_timesteps: int,
        network: nn.Module,
        snr_estimator: nn.Module,
        segmentor: Segmentor,
        snr_estimate_scale: float = 100.0,
        noise_condition: str = "sqrt_alpha_bar",
        p_transition: str = "original",
        q_transition: str = "original",
    ):
        if noise_condition != "sqrt_alpha_bar":
            raise NotImplementedError(noise_condition)
        if p_transition not in ("original", "condition_in"):
            raise NotImplementedError(p_transition)
        if q_transition != "original":
            raise NotImplementedError(q_transition)
        self.num_timesteps = diffusion_timesteps
        self.network = network
        self.snr_estimator = snr_estimator
        self.segmentor = segmentor
        self.snr_estimate_scale = snr_estimate_scale

    def init(self, key: jax.Array, sample_shape: Tuple[int, ...]):
        k1, k2 = jax.random.split(key)
        b = sample_shape[0]
        seg_shape = (b, 1, self.segmentor.n_frames, self.segmentor.frame_len)
        seg = jnp.zeros(seg_shape, jnp.float32)
        level = jnp.ones((b, 1, self.segmentor.n_frames, 1), jnp.float32)
        return {
            "network": self.network.init(k1, seg, seg, level),
            "snr_estimator": self.snr_estimator.init(k2, seg),
        }

    def _tables(self, params, condition_seg):
        snr = self.snr_estimator.apply(params["snr_estimator"], condition_seg)
        # stop-gradient: the estimator is frozen (train_with_snr_estimator.py:48-52)
        snr = jax.lax.stop_gradient(snr)
        return var.variable_tables(
            snr, self.num_timesteps, self.snr_estimate_scale
        )

    def forward(self, params, key, target, condition, deterministic=True):
        """Returns ``(eps_hat, eps)`` on segmented [B,1,N,L] tensors
        (model/model.py:153-175)."""
        target_seg = self.segmentor(target)
        condition_seg = self.segmentor(condition)
        vsched = self._tables(params, condition_seg)
        k_q, k_drop = jax.random.split(key)
        x_t, noise, noise_level, _t = var.q_stochastic(vsched, target_seg, k_q)
        rngs = {"dropout": k_drop} if not deterministic else None
        predicted = self.network.apply(
            self._prepare_network(params["network"]), condition_seg, x_t,
            noise_level, deterministic=deterministic, rngs=rngs,
        )
        return predicted, noise

    def _prepare_network(self, net_params):
        """Engine hook (see SDDM._prepare): packed engines re-derive their
        weight set once per call, outside the sampling scan."""
        prep = getattr(self.network, "prepare", None)
        return prep(net_params) if prep is not None else net_params

    def infer(self, params, key, condition):
        """Full reverse sampler + cross-fade overlap-add
        (model/model.py:177-203), as one ``lax.scan``."""
        condition_seg = self.segmentor(condition)
        vsched = self._tables(params, condition_seg)
        net_params = self._prepare_network(params["network"])
        k_init, k_scan = jax.random.split(key)
        x_T = var.get_x_T(vsched, condition_seg, k_init)
        ts = jnp.arange(self.num_timesteps, 0, -1)

        def step(carry, t):
            x_t, k = carry
            k, sub = jax.random.split(k)
            nl = var.get_noise_level(vsched, t)
            predicted = self.network.apply(
                net_params, condition_seg, x_t, nl, deterministic=True
            )
            x_next = var.p_transition(vsched, x_t, t, predicted, sub)
            return (x_next, k), None

        (x_0, _), _ = jax.lax.scan(step, (x_T, k_scan), ts)
        return self.segmentor.overlap_add(x_0)
