"""SNR-estimator trainer.

Parity: reference trainer/snr_estimator_trainer.py:10-136 — trains
``SNREstimator`` to regress per-segment SI-SNR of the noisy condition vs the
clean target: ``loss = criterion(estimator(segment(condition)),
segment_sisnr(segment(condition), segment(target)))``.

The whole step (segmentation, SI-SNR target computation, forward, loss,
update) is one jitted function.
"""

from __future__ import annotations

import time
from datetime import timedelta

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.metrics import segment_sisnr
from ..parallel.mesh import make_mesh, replicate, shard_batch
from ..utils.util import MetricTracker, inf_loop
from .base_trainer import BaseTrainer
from .state import TrainState


class SNREstimatorTrainer(BaseTrainer):
    def __init__(
        self,
        model,  # SNREstimator flax module
        segmentor,
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
    ):
        super().__init__(model, criterion, metric_ftns, tx, config)
        self.segmentor = segmentor
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
        self.lr_scheduler = lr_scheduler
        self.log_step = cfg_trainer.get("log_step", 100)

        self.train_metrics = MetricTracker("loss", writer=self.writer)
        self.valid_metrics = MetricTracker(
            "loss", *[m.__name__ for m in self.metric_ftns], writer=self.writer
        )

        self.mesh = mesh if mesh is not None else make_mesh()
        self.key = jax.random.PRNGKey(seed)
        init_key, self.key = jax.random.split(self.key)
        batch = data_loader.batch_size
        seg_shape = (batch, 1, segmentor.n_frames, segmentor.frame_len)
        params = model.init(init_key, jnp.zeros(seg_shape, jnp.float32))
        self.state = replicate(TrainState.create(params, tx), self.mesh)
        self._maybe_resume()

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._valid_step = jax.jit(self._valid_step_impl)

    def _targets(self, target, condition):
        target_seg = self.segmentor(target)
        condition_seg = self.segmentor(condition)
        true_sisnr = segment_sisnr(condition_seg, target_seg)
        return condition_seg, true_sisnr

    def _train_step_impl(self, state, key, target, condition):
        condition_seg, true_sisnr = self._targets(target, condition)

        def loss_fn(params):
            out = self.model.apply(
                params, condition_seg, deterministic=False,
                rngs={"dropout": key},
            )
            return self.criterion(jnp.squeeze(out), true_sisnr)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            loss,
        )

    def _valid_step_impl(self, params, target, condition):
        condition_seg, true_sisnr = self._targets(target, condition)
        out = self.model.apply(params, condition_seg)
        loss = self.criterion(jnp.squeeze(out), true_sisnr)
        return loss, jnp.squeeze(out), true_sisnr

    def _train_epoch(self, epoch: int) -> dict:
        self.epoch_start = time.time()
        self.train_metrics.reset()
        step_losses = []  # device scalars; ONE host sync at epoch end
        for batch_idx, (target, condition, _idx) in enumerate(self.data_loader):
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
                    epoch, self._progress(batch_idx), loss_val,
                )
            if batch_idx == self.len_epoch:
                break
        log = self.train_metrics.result()
        # epoch loss averages EVERY step like the reference (see Trainer)
        if step_losses:
            log["loss"] = float(np.mean([float(x) for x in step_losses]))
        if self.do_validation and (epoch % self.valid_period == 0):
            val_log = self._valid_epoch(epoch)
            log.update(**{"val_" + k: v for k, v in val_log.items()})
        return log

    def _valid_epoch(self, epoch: int) -> dict:
        self.valid_metrics.reset()
        for batch_idx, (target, condition, _idx) in enumerate(
            self.valid_data_loader
        ):
            if batch_idx >= self.n_valid_data_batch > 0:
                break
            batch = shard_batch(
                (jnp.asarray(target), jnp.asarray(condition)), self.mesh
            )
            loss, out, true = self._valid_step(self.state.params, *batch)
            self.writer.set_step(
                (epoch - 1) * len(self.valid_data_loader) + batch_idx, "valid"
            )
            self.valid_metrics.update("loss", float(loss))
            for m in self.metric_ftns:
                self.valid_metrics.update(m.__name__, float(m(out, true)))
        return self.valid_metrics.result()

    def _progress(self, batch_idx: int) -> str:
        lapsed = time.time() - self.epoch_start
        total = self.len_epoch
        time_left = timedelta(seconds=lapsed * ((total / max(batch_idx, 1)) - 1))
        return "[{}/{} | {:.0f}s/{}, ({:.0f}%), ]".format(
            batch_idx, total, lapsed, time_left, 100.0 * batch_idx / total
        )
