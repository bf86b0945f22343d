"""Multi-host helpers on a single-process 8-device mesh."""

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


class TestSummary:
    def test_param_count(self):
        params = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(5)}}
        assert param_count(params) == 11
        assert "11" in model_summary("m", params)
