"""Trainer orchestration edge behaviors: early stop, max-mode monitor,
save_period, checkpoint rotation order, logwav dataset path."""

import numpy as np
import pytest

from sddm_tpu.train.base_trainer import BaseTrainer
from sddm_tpu.train.checkpoints import (
    CKPT_BEST,
    CKPT_CURRENT,
    CKPT_LAST,
    load_checkpoint,
    save_rotating_checkpoint,
)
from sddm_tpu.train.state import TrainState
from sddm_tpu.utils import ConfigParser


class _StubTrainer(BaseTrainer):
    """Feeds a scripted sequence of val_loss values through the epoch loop."""

    def __init__(self, config, losses):
        class _Model:  # arch name for the checkpoint payload
            pass

        import optax

        tx = optax.sgd(1e-3)
        super().__init__(_Model(), lambda a, b: 0.0, [], tx, config)
        params = {"w": np.zeros(3, np.float32)}
        self.state = TrainState.create(params, tx)
        self._losses = losses
        self.epochs_run = []

    def _train_epoch(self, epoch):
        self.epochs_run.append(epoch)
        return {"val_loss": self._losses[epoch - 1]}


def make_config(tmp_path, **trainer):
    base = {
        "epochs": 6,
        "save_dir": str(tmp_path / "saved"),
        "save_period": 1,
        "verbosity": 1,
        "monitor": "min val_loss",
        "early_stop": -1,
        "tensorboard": False,
    }
    base.update(trainer)
    return ConfigParser(
        {"name": "t", "arch": {"type": "X"}, "optimizer": {"type": "SGD"},
         "trainer": base},
        run_id=trainer.get("run_id", "r"),
    )


class TestMonitorLoop:
    def test_early_stop(self, tmp_path):
        cfg = make_config(tmp_path, early_stop=1, run_id="es")
        t = _StubTrainer(cfg, [5.0, 4.0, 4.5, 4.6, 4.7, 4.8])
        t.train()
        # improves at 1,2; stale at 3 (count 1), stale at 4 (count 2 > 1) -> stop
        assert t.epochs_run == [1, 2, 3, 4]

    def test_max_mode(self, tmp_path):
        cfg = make_config(tmp_path, monitor="max val_loss", run_id="mx",
                          epochs=3)
        t = _StubTrainer(cfg, [1.0, 2.0, 1.5])
        t.train()
        assert t.mnt_best == 2.0

    def test_monitor_off(self, tmp_path):
        cfg = make_config(tmp_path, monitor="off", run_id="off", epochs=2)
        t = _StubTrainer(cfg, [1.0, 2.0])
        t.train()
        assert t.epochs_run == [1, 2]

    def test_save_period(self, tmp_path):
        cfg = make_config(tmp_path, save_period=2, run_id="sp", epochs=4)
        t = _StubTrainer(cfg, [4.0, 3.0, 2.0, 1.0])
        t.train()
        # saves at epochs 2 and 4 -> current + last exist
        assert (cfg.save_dir / CKPT_CURRENT).is_file()
        assert (cfg.save_dir / CKPT_LAST).is_file()
        assert load_checkpoint(cfg.save_dir / CKPT_CURRENT)["epoch"] == 4
        assert load_checkpoint(cfg.save_dir / CKPT_LAST)["epoch"] == 2

    def test_best_saved_off_period(self, tmp_path):
        """An improvement at an epoch that is NOT a save-period multiple
        must still persist model_best (the reference template only writes
        best inside the ``epoch % save_period`` gate and silently drops
        those weights — base/base_trainer.py:96-97)."""
        cfg = make_config(tmp_path, save_period=2, run_id="bo", epochs=4)
        # best val_loss lands at epoch 3 (off-period); epoch 4 regresses
        t = _StubTrainer(cfg, [4.0, 3.0, 1.0, 2.0])
        t.train()
        best = load_checkpoint(cfg.save_dir / CKPT_BEST)
        assert best["epoch"] == 3
        assert best["monitor_best"] == 1.0
        # rotation untouched by the best-only write
        assert load_checkpoint(cfg.save_dir / CKPT_CURRENT)["epoch"] == 4
        assert load_checkpoint(cfg.save_dir / CKPT_LAST)["epoch"] == 2


class TestRotation:
    def test_current_renamed_to_last(self, tmp_path):
        params = {"w": np.ones(2, np.float32)}
        import optax

        opt = optax.sgd(0.1).init(params)
        for epoch in (1, 2, 3):
            save_rotating_checkpoint(
                tmp_path, arch="A", epoch=epoch, params=params,
                opt_state=opt, monitor_best=0.5, save_best=(epoch == 2),
            )
        assert load_checkpoint(tmp_path / CKPT_CURRENT)["epoch"] == 3
        assert load_checkpoint(tmp_path / CKPT_LAST)["epoch"] == 2
        assert load_checkpoint(tmp_path / CKPT_BEST)["epoch"] == 2


class TestLogwavDataset:
    def test_logwav_crop(self, tmp_path):
        from sddm_tpu.data import AudioDataset

        rng = np.random.RandomState(0)
        for sub in ("clean", "noisy"):
            (tmp_path / sub).mkdir()
        for i in range(2):
            x = rng.uniform(-0.9, 0.9, (1, 900)).astype(np.float32)
            np.save(tmp_path / "clean" / f"u{i}.logwav.npy", x)
            np.save(tmp_path / "noisy" / f"u{i}.logwav.npy", x)
        ds = AudioDataset(tmp_path, ".logwav.npy", sample_rate=16000, T=256)
        clean, noisy, idx = ds[0]
        assert clean.shape == (1, 256)
        assert ds.get_name(0) == "u0"

    def test_infer_logwav(self, tmp_path):
        from sddm_tpu.data import InferDataset

        rng = np.random.RandomState(1)
        for sub in ("clean", "noisy"):
            (tmp_path / sub).mkdir()
        x = rng.uniform(-0.9, 0.9, (1, 700)).astype(np.float32)
        np.save(tmp_path / "clean" / "a.logwav.npy", x)
        np.save(tmp_path / "noisy" / "a.logwav.npy", x)
        ds = InferDataset(tmp_path, ".logwav.npy", sample_rate=16000, T=256)
        clean, noisy, idx = ds[0]
        assert clean.shape == (3, 1, 256)  # ceil(700/256) chunks
