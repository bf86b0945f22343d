"""Config system tests (reference parse_config.py semantics)."""

import argparse
import json

import pytest

from sddm_tpu.utils import ConfigParser, MetricTracker, TensorboardWriter
from sddm_tpu.utils.config import _set_by_path


def base_config(tmp_path, name="cfgtest"):
    return {
        "name": name,
        "arch": {"type": "SDDM", "args": {}},
        "optimizer": {"type": "Adam", "args": {"lr": 0.002}},
        "trainer": {"save_dir": str(tmp_path / "saved"), "verbosity": 1},
    }


class TestConfigParser:
    def test_run_dir_and_snapshot(self, tmp_path):
        cfg = ConfigParser(base_config(tmp_path), run_id="rid")
        assert cfg.save_dir == tmp_path / "saved" / "cfgtest" / "rid"
        snap = json.loads((cfg.save_dir / "config.json").read_text())
        assert snap["optimizer"]["args"]["lr"] == 0.002

    def test_keypath_modification(self, tmp_path):
        cfg = ConfigParser(
            base_config(tmp_path),
            modification={"optimizer;args;lr": 0.1},
            run_id="rid2",
        )
        assert cfg["optimizer"]["args"]["lr"] == 0.1

    def test_none_modification_ignored(self, tmp_path):
        cfg = ConfigParser(
            base_config(tmp_path),
            modification={"optimizer;args;lr": None},
            run_id="rid3",
        )
        assert cfg["optimizer"]["args"]["lr"] == 0.002

    def test_init_obj_registry(self, tmp_path):
        registry = {"Adam": lambda lr: ("adam", lr)}
        cfg = ConfigParser(base_config(tmp_path), run_id="rid4")
        assert cfg.init_obj("optimizer", registry) == ("adam", 0.002)

    def test_init_obj_kwarg_conflict(self, tmp_path):
        registry = {"Adam": lambda lr: lr}
        cfg = ConfigParser(base_config(tmp_path), run_id="rid5")
        with pytest.raises(ValueError):
            cfg.init_obj("optimizer", registry, lr=5)

    def test_init_ftn(self, tmp_path):
        registry = {"Adam": lambda x, lr: (x, lr)}
        cfg = ConfigParser(base_config(tmp_path), run_id="rid6")
        fn = cfg.init_ftn("optimizer", registry)
        assert fn(7) == (7, 0.002)

    def test_from_args_requires_config(self, tmp_path):
        parser = argparse.ArgumentParser()
        parser.add_argument("-c", "--config", default=None)
        parser.add_argument("-r", "--resume", default=None)
        parser.add_argument("-d", "--device", default=None)
        with pytest.raises(SystemExit):
            ConfigParser.from_args(parser.parse_args([]))

    def test_from_args_resume_merges_run_config(self, tmp_path):
        # first run writes its snapshot
        first = ConfigParser(base_config(tmp_path), run_id="orig")
        ckpt = first.save_dir / "checkpoint_current.ckpt"
        ckpt.write_bytes(b"")
        # fine-tune config overrides lr
        ft = dict(base_config(tmp_path))
        ft["optimizer"] = {"type": "Adam", "args": {"lr": 9.0}}
        ft_path = tmp_path / "ft.json"
        ft_path.write_text(json.dumps(ft))

        parser = argparse.ArgumentParser()
        parser.add_argument("-c", "--config", default=None)
        parser.add_argument("-r", "--resume", default=None)
        parser.add_argument("-d", "--device", default=None)
        args = parser.parse_args(
            ["-r", str(ckpt), "-c", str(ft_path)]
        )
        cfg = ConfigParser.from_args(args)
        assert cfg.resume == ckpt
        assert cfg["optimizer"]["args"]["lr"] == 9.0

    def test_set_by_path(self):
        tree = {"a": {"b": {"c": 1}}}
        _set_by_path(tree, "a;b;c", 5)
        assert tree["a"]["b"]["c"] == 5


class TestTracker:
    def test_running_average(self):
        t = MetricTracker("loss")
        t.update("loss", 1.0)
        t.update("loss", 3.0)
        assert t.avg("loss") == 2.0
        assert t.result() == {"loss": 2.0}
        t.reset()
        assert t.avg("loss") == 0.0

    def test_weighted(self):
        t = MetricTracker("m")
        t.update("m", 2.0, n=3)
        t.update("m", 6.0, n=1)
        assert t.avg("m") == 3.0


@pytest.mark.slow
class TestTBWriter:
    def test_jsonl_sidecar(self, tmp_path):
        w = TensorboardWriter(tmp_path, enabled=True)
        w.set_step(0)
        w.add_scalar("loss", 1.5)
        w.set_step(1, "valid")
        w.add_scalar("loss", 0.5)
        w.close()
        lines = [
            json.loads(l)
            for l in (tmp_path / "scalars.jsonl").read_text().splitlines()
        ]
        tags = {l["tag"] for l in lines}
        assert "loss/train" in tags and "loss/valid" in tags
        # steps_per_sec recorded on step advance (reference visualization.py:47)
        assert any(t.startswith("steps_per_sec") for t in tags)

    def test_disabled_noop(self, tmp_path):
        w = TensorboardWriter(tmp_path, enabled=False)
        w.set_step(0)
        w.add_scalar("x", 1.0)  # must not raise
        assert not (tmp_path / "scalars.jsonl").exists()
