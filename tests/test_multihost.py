"""Multi-host helpers: single-process 8-device mesh tests plus a REAL
2-process jax.distributed test (Gloo CPU collectives)."""

import json
import socket
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np

from sddm_tpu.parallel import make_mesh
from sddm_tpu.parallel.multihost import (
    PerHostLoader,
    global_batch_from_local,
    process_shard_indices,
)
from sddm_tpu.utils.util import model_summary, param_count


class TestMultihost:
    def test_shard_indices_single_process(self):
        idx = process_shard_indices(10)
        np.testing.assert_array_equal(idx, np.arange(10))

    def test_global_batch(self):
        mesh = make_mesh()
        local = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
        out = global_batch_from_local(local, mesh)
        assert out["x"].shape == (8, 2)
        assert len(out["x"].sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(out["x"]), local["x"])

    def test_per_host_loader(self, tmp_path):
        from sddm_tpu.data import AudioDataset, save_wav

        for sub in ("clean", "noisy"):
            (tmp_path / sub).mkdir()
        rng = np.random.RandomState(0)
        for i in range(8):
            x = rng.uniform(-0.5, 0.5, 500).astype(np.float32)
            save_wav(tmp_path / "clean" / f"u{i}.wav", x, 16000)
            save_wav(tmp_path / "noisy" / f"u{i}.wav", x, 16000)
        ds = AudioDataset(tmp_path, ".wav", sample_rate=16000, T=256)
        mesh = make_mesh()
        loader = PerHostLoader(ds, batch_size=8, mesh=mesh)
        target, condition, idx = next(iter(loader))
        assert target.shape == (8, 1, 256)
        assert len(target.sharding.device_set) == 8


class TestShardBalance:
    def test_equal_shards_when_uneven(self, monkeypatch):
        """7 samples over 2 hosts: both get ceil(7/2)=4 indices (wrapped),
        so len(loader) agrees — the lockstep-deadlock fix (VERDICT #8)."""
        import sddm_tpu.parallel.multihost as mh

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        shards = []
        for p in range(2):
            monkeypatch.setattr(jax, "process_index", lambda p=p: p)
            shards.append(mh.process_shard_indices(7))
        assert len(shards[0]) == len(shards[1]) == 4
        # union covers the dataset; the pad wraps to index 0
        seen = set(shards[0]) | set(shards[1])
        assert seen == set(range(7))
        assert sorted(np.concatenate(shards)).count(0) == 2


class TestTwoProcess:
    def test_two_process_train_step(self, tmp_path):
        """Spawn two jax.distributed CPU processes; each loads its shard via
        PerHostLoader, assembles global batches, and runs a jitted
        data-parallel grad step.  Both must report identical loader length
        and identical (global) loss."""
        from sddm_tpu.data import save_wav

        for sub in ("clean", "noisy"):
            (tmp_path / sub).mkdir()
        rng = np.random.RandomState(0)
        for i in range(7):  # odd count exercises the shard padding
            x = rng.uniform(-0.5, 0.5, 200).astype(np.float32)
            save_wav(tmp_path / "clean" / f"u{i}.wav", x, 16000)
            save_wav(tmp_path / "noisy" / f"u{i}.wav", x, 16000)

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]

        worker = Path(__file__).parent / "multihost_worker.py"
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(p), "2", str(port),
                 str(tmp_path)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                cwd=str(Path(__file__).parent.parent),
            )
            for p in range(2)
        ]
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=300)
            assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
            outs.append(json.loads(out.strip().splitlines()[-1]))

        assert outs[0]["devices"] == outs[1]["devices"] == 4
        assert outs[0]["len_loader"] == outs[1]["len_loader"] == 2
        assert outs[0]["n_batches"] == outs[1]["n_batches"]
        assert outs[0]["loss"] == outs[1]["loss"]


class TestSummary:
    def test_param_count(self):
        params = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(5)}}
        assert param_count(params) == 11
        assert "11" in model_summary("m", params)
