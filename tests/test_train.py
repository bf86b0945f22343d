"""End-to-end training tests on tiny shapes: config system, jitted train
step, validation-with-sampling, checkpoint rotation + resume, and
data-parallel sharding over the 8-device virtual CPU mesh."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

import json

import jax
import numpy as np
import pytest

from sddm_tpu.data import AudioDataLoader, AudioDataset, save_wav
from sddm_tpu.diffusion import DiffusionSchedule
from sddm_tpu.models import SDDM, UNetModified2, get_loss, get_metric
from sddm_tpu.parallel import make_mesh
from sddm_tpu.train import Trainer, make_optimizer
from sddm_tpu.train.checkpoints import (
    CKPT_BEST,
    CKPT_CURRENT,
    CKPT_LAST,
    load_checkpoint,
)
from sddm_tpu.utils import ConfigParser

NUM_SAMPLES = 72  # 8 frames of 16 @ stride 8


def make_config(tmp_path, **trainer_overrides):
    trainer = {
        "epochs": 2,
        "save_dir": str(tmp_path / "saved"),
        "save_period": 1,
        "verbosity": 1,
        "n_valid_data_batch": 1,
        "valid_period": 1,
        "log_step": 1,
        "monitor": "min val_loss",
        "early_stop": -1,
        "tensorboard": False,
    }
    trainer.update(trainer_overrides)
    cfg = {
        "name": "test_run",
        "sample_rate": 16000,
        "num_samples": NUM_SAMPLES,
        "arch": {"type": "SDDM", "args": {"p_transition": "condition_in",
                                          "q_transition": "original"}},
        "diffusion": {"type": "GaussianDiffusion",
                      "args": {"schedule": "linear", "n_timestep": 3,
                               "linear_start": 1e-6, "linear_end": 1e-3}},
        "network": {"type": "UNetModified2",
                    "args": {"inner_channel": 8, "norm_groups": 4,
                             "channel_mults": [1, 2], "res_blocks": 1,
                             "segment_len": 16, "segment_stride": 8}},
        "optimizer": {"type": "Adam",
                      "args": {"lr": 1e-3, "weight_decay": 0,
                               "amsgrad": True}},
        "loss": "l1_loss",
        "metrics": ["sisnr"],
        "trainer": trainer,
    }
    return cfg


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_data")
    rng = np.random.RandomState(0)
    for sub in ("clean", "noisy"):
        (root / sub).mkdir()
    for i in range(8):
        clean = rng.uniform(-0.5, 0.5, 200).astype(np.float32)
        save_wav(root / "clean" / f"u{i}.wav", clean, 16000)
        save_wav(root / "noisy" / f"u{i}.wav", clean + 0.05 * rng.randn(200).astype(np.float32), 16000)
    return root


def build_trainer(cfg_dict, data_root, run_id="t0", resume=None):
    config = ConfigParser(cfg_dict, resume=resume, run_id=run_id)
    sched = DiffusionSchedule.create(**{
        k: v for k, v in cfg_dict["diffusion"]["args"].items()
    })
    net = UNetModified2(num_samples=NUM_SAMPLES, **cfg_dict["network"]["args"])
    model = SDDM(sched, net, **cfg_dict["arch"]["args"])
    ds = AudioDataset(data_root, ".wav", sample_rate=16000, T=NUM_SAMPLES)
    dl = AudioDataLoader(ds, batch_size=8, shuffle=True, num_workers=1)
    vdl = AudioDataLoader(ds, batch_size=8, shuffle=False, num_workers=1)
    tx = make_optimizer(cfg_dict["optimizer"])
    return Trainer(
        model,
        get_loss(cfg_dict["loss"]),
        [get_metric(m) for m in cfg_dict["metrics"]],
        tx,
        config,
        dl,
        valid_data_loader=vdl,
        mesh=make_mesh(),
    ), config


class TestTrainer:
    def test_train_two_epochs_and_checkpoint(self, data_root, tmp_path):
        cfg = make_config(tmp_path)
        trainer, config = build_trainer(cfg, data_root)
        trainer.train()
        # checkpoint rotation: epoch1 -> current; epoch2 -> current, last
        assert (config.save_dir / CKPT_CURRENT).is_file()
        assert (config.save_dir / CKPT_LAST).is_file()
        assert (config.save_dir / CKPT_BEST).is_file()  # monitor improved
        # validation wrote samples
        wavs = list((config.save_dir / "samples" / "output").glob("*.wav"))
        assert wavs, "validation should write output wavs"
        # config snapshot written
        snap = json.loads((config.save_dir / "config.json").read_text())
        assert snap["name"] == "test_run"

    def test_epoch_loss_averages_every_step(self, data_root, tmp_path):
        """Regression: with log_step > steps-per-epoch the tracker saw no
        updates and the epoch loss reported 0.0 (hit by the round-4 synth
        runs); the epoch average must cover every step like the reference
        (trainer/trainer.py:69-81)."""
        cfg = make_config(tmp_path, log_step=10_000, valid_period=100)
        trainer, _ = build_trainer(cfg, data_root, run_id="ls")
        log = trainer._train_epoch(1)
        assert log["loss"] > 0.0

    def test_resume(self, data_root, tmp_path):
        cfg = make_config(tmp_path)
        trainer, config = build_trainer(cfg, data_root, run_id="a")
        trainer.train()
        ckpt_path = config.save_dir / CKPT_CURRENT
        ckpt = load_checkpoint(ckpt_path)
        assert ckpt["epoch"] == 2

        cfg2 = make_config(tmp_path, epochs=3)
        trainer2, _ = build_trainer(
            cfg2, data_root, run_id="b", resume=ckpt_path
        )
        assert trainer2.start_epoch == 3
        assert trainer2.mnt_best == ckpt["monitor_best"]
        trainer2.train()  # runs epoch 3 only

    def test_loss_decreases(self, data_root, tmp_path):
        cfg = make_config(tmp_path, epochs=1, valid_period=100)
        trainer, _ = build_trainer(cfg, data_root)
        # run several steps over the same batches, collect losses
        losses = []
        import jax.numpy as jnp
        from sddm_tpu.parallel import shard_batch
        batch = next(iter(trainer.data_loader))
        t, c = shard_batch(
            (jnp.asarray(batch[0]), jnp.asarray(batch[1])), trainer.mesh
        )
        for _ in range(30):
            trainer.key, k = jax.random.split(trainer.key)
            trainer.state, loss = trainer._train_step(trainer.state, k, t, c)
            losses.append(float(loss))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])


class TestFewStepValidation:
    def test_valid_steps_and_ddim(self, data_root, tmp_path):
        """`trainer.valid_steps` (+`valid_ddim`) validates through the
        few-step sampler: the valid model carries the subsampled schedule
        and a full train() produces finite few-step val metrics."""
        cfg = make_config(tmp_path, valid_steps=2, valid_ddim=True)
        trainer, config = build_trainer(cfg, data_root)
        assert trainer.valid_model is not trainer.model
        assert trainer.valid_model.p_transition == "ddim"
        # subsampled schedule: T+1 tables shrink to valid_steps+1
        assert trainer.valid_model.diffusion.alpha_bar.shape[0] == 3
        trainer.train()
        log = trainer._valid_epoch(2)
        assert np.isfinite(log["loss"])

    def test_default_keeps_full_sampler(self, data_root, tmp_path):
        cfg = make_config(tmp_path, epochs=1, valid_period=100)
        trainer, _ = build_trainer(cfg, data_root)
        assert trainer.valid_model is trainer.model


class TestSharding:
    def test_batch_sharded_over_8_devices(self, data_root, tmp_path):
        assert jax.device_count() == 8
        cfg = make_config(tmp_path, epochs=1, valid_period=100)
        trainer, _ = build_trainer(cfg, data_root, run_id="s")
        import jax.numpy as jnp
        from sddm_tpu.parallel import shard_batch
        batch = next(iter(trainer.data_loader))
        t, c = shard_batch(
            (jnp.asarray(batch[0]), jnp.asarray(batch[1])), trainer.mesh
        )
        # batch axis is split across all 8 devices
        assert len(t.sharding.device_set) == 8
        trainer.key, k = jax.random.split(trainer.key)
        state, loss = trainer._train_step(trainer.state, k, t, c)
        assert np.isfinite(float(loss))
        # params remain replicated
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        assert len(leaf.sharding.device_set) == 8
