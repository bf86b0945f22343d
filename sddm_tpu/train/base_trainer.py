"""Base training orchestration: epoch loop, monitor-metric best tracking,
early stopping, checkpoint rotation and resume.

Parity: reference base/base_trainer.py:7-155.  Differences are TPU-native:
model/optimizer state live in a functional ``TrainState`` pytree (replicated
over the mesh), checkpoints are msgpack (see checkpoints.py), and subclass
``_train_epoch`` implementations run jitted steps.
"""

from __future__ import annotations

import abc
from numbers import Number

import numpy as np

from ..utils.tb_writer import TensorboardWriter
from .checkpoints import (
    load_checkpoint,
    save_best_checkpoint,
    save_rotating_checkpoint,
)
from .state import TrainState


class BaseTrainer(abc.ABC):
    def __init__(self, model, criterion, metric_ftns, tx, config):
        self.config = config
        self.logger = config.get_logger(
            "trainer", config["trainer"]["verbosity"]
        )
        self.model = model
        self.criterion = criterion
        self.metric_ftns = metric_ftns
        self.tx = tx

        cfg_trainer = config["trainer"]
        self.epochs = cfg_trainer["epochs"]
        self.save_period = cfg_trainer["save_period"]
        self.valid_period = cfg_trainer.get("valid_period", 10)
        self.monitor = cfg_trainer.get("monitor", "off")

        if self.monitor == "off":
            self.mnt_mode = "off"
            self.mnt_best = 0
            self.early_stop = np.inf
        else:
            self.mnt_mode, self.mnt_metric = self.monitor.split()
            assert self.mnt_mode in ("min", "max")
            self.mnt_best = np.inf if self.mnt_mode == "min" else -np.inf
            self.early_stop = cfg_trainer.get("early_stop", np.inf)
            if self.early_stop <= 0:
                self.early_stop = np.inf

        self.start_epoch = 1
        self.checkpoint_dir = config.save_dir
        self.writer = TensorboardWriter(
            config.log_dir, self.logger, cfg_trainer.get("tensorboard", False)
        )
        # subclasses set self.state (TrainState) before calling _maybe_resume

    @abc.abstractmethod
    def _train_epoch(self, epoch: int) -> dict:
        ...

    def train(self) -> None:
        """Full training loop (reference base_trainer.py:58-98)."""
        not_improved_count = 0
        for epoch in range(self.start_epoch, self.epochs + 1):
            result = self._train_epoch(epoch)

            log = {"epoch": epoch, **result}
            for key, value in log.items():
                if isinstance(value, Number):
                    self.logger.info("    {:15s}: {}".format(str(key), value))

            best = False
            if self.mnt_mode != "off":
                if self.mnt_metric in log:
                    improved = (
                        self.mnt_mode == "min"
                        and log[self.mnt_metric] <= self.mnt_best
                    ) or (
                        self.mnt_mode == "max"
                        and log[self.mnt_metric] >= self.mnt_best
                    )
                    if improved:
                        self.mnt_best = log[self.mnt_metric]
                        not_improved_count = 0
                        best = True
                        # Persist the best weights the moment the monitor
                        # improves.  The reference template
                        # (base/base_trainer.py:96-97) only writes
                        # model_best inside the ``epoch % save_period``
                        # gate, so an improvement at a validation epoch
                        # that is not a save-period multiple updates
                        # mnt_best but silently drops the weights — the
                        # "best" checkpoint on disk can be arbitrarily
                        # stale (observed: best val_loss at epoch 275,
                        # newest model_best from epoch 150).  Deliberate
                        # divergence: best saves are decoupled from the
                        # rotation period.
                        self._save_best(epoch)
                    else:
                        not_improved_count += 1
                if not_improved_count > self.early_stop:
                    self.logger.info(
                        "Validation performance didn't improve for %s "
                        "validations. Training stops.",
                        self.early_stop,
                    )
                    break

            if epoch % self.save_period == 0:
                # best already persisted at improvement time above
                self._save_checkpoint(epoch, save_best=False)

    def _save_checkpoint(self, epoch: int, save_best: bool = False) -> None:
        save_rotating_checkpoint(
            self.checkpoint_dir,
            arch=type(self.model).__name__,
            epoch=epoch,
            params=self.state.params,
            opt_state=self.state.opt_state,
            monitor_best=self.mnt_best,
            config=dict(self.config.config),
            save_best=save_best,
        )

    def _save_best(self, epoch: int) -> None:
        """Write model_best.ckpt immediately (no current/last rotation)."""
        save_best_checkpoint(
            self.checkpoint_dir,
            arch=type(self.model).__name__,
            epoch=epoch,
            params=self.state.params,
            opt_state=self.state.opt_state,
            monitor_best=self.mnt_best,
            config=dict(self.config.config),
        )

    def _maybe_resume(self) -> None:
        if self.config.resume is None:
            return
        path = str(self.config.resume)
        self.logger.info("Loading checkpoint: %s ...", path)
        ckpt = load_checkpoint(
            path,
            params_template=self.state.params,
            opt_state_template=self.state.opt_state,
        )
        self.start_epoch = ckpt["epoch"] + 1
        self.mnt_best = ckpt["monitor_best"]
        if ckpt["config"].get("arch") != self.config["arch"]:
            self.logger.warning(
                "Architecture config differs from checkpoint; state load may "
                "be incompatible."
            )
        params = ckpt["params"]
        opt_state = self.state.opt_state
        if ckpt["config"].get("optimizer", {}).get("type") != self.config[
            "optimizer"
        ].get("type"):
            self.logger.warning(
                "Optimizer type differs from checkpoint; optimizer state not "
                "resumed."
            )
        else:
            opt_state = ckpt["opt_state"]
        self.state = TrainState(
            step=self.state.step, params=params, opt_state=opt_state
        )
        self.logger.info(
            "Checkpoint loaded. Resuming from epoch %d", self.start_epoch
        )
