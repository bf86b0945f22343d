"""Serving API: chunking, static-shape batching, mesh sharding, length
round-trips."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

import jax
import numpy as np
import pytest

from sddm_tpu.diffusion import DiffusionSchedule
from sddm_tpu.enhance import Enhancer
from sddm_tpu.models import SDDM, UNetModified2
from sddm_tpu.parallel import make_mesh

NS = 72


@pytest.fixture(scope="module")
def enhancer():
    sched = DiffusionSchedule.create("linear", 3, 1e-6, 1e-3)
    net = UNetModified2(
        num_samples=NS, inner_channel=8, norm_groups=4, channel_mults=(1, 2),
        res_blocks=1, segment_len=16, segment_stride=8,
    )
    model = SDDM(sched, net, p_transition="condition_in")
    params = model.init(jax.random.PRNGKey(0), (2, 1, NS))
    return Enhancer(model, params, NS, batch_rows=8, mesh=make_mesh())


class TestEnhancer:
    def test_single_short(self, enhancer):
        x = np.random.RandomState(0).uniform(-0.3, 0.3, 50).astype(np.float32)
        y = enhancer.enhance(x)
        assert y.shape == (50,)
        assert np.all(np.isfinite(y))

    def test_lengths_round_trip(self, enhancer):
        rng = np.random.RandomState(1)
        lens = [10, NS, NS + 1, 5 * NS - 3]
        audios = [rng.uniform(-0.3, 0.3, n).astype(np.float32) for n in lens]
        outs = enhancer.enhance_batch(audios)
        assert [o.shape[-1] for o in outs] == lens

    def test_warmup_precompiles(self, enhancer):
        """warmup() compiles the serving-shape program so the first request
        reuses it (VERDICT #9: no fresh compile on the request path)."""
        dt = enhancer.warmup(timeout_s=120.0)
        assert dt >= 0.0
        size0 = enhancer._infer._cache_size()
        x = np.random.RandomState(3).uniform(-0.3, 0.3, 40).astype(np.float32)
        enhancer.enhance(x)
        assert enhancer._infer._cache_size() == size0 == 1

    def test_warmup_timeout_raises(self):
        """A warmup that cannot finish in time fails fast with a clear
        diagnostic instead of hanging the serving process."""
        class _Slow:
            @staticmethod
            def infer(params, key, cond):
                import time as _t
                _t.sleep(2.0)
                return cond

        e = Enhancer(_Slow, {}, NS, batch_rows=8, mesh=make_mesh())
        with pytest.raises(TimeoutError, match="compile"):
            e.warmup(timeout_s=0.2)

    def test_static_shapes_single_compile(self, enhancer):
        """Different utterance lengths must reuse ONE compiled program."""
        rng = np.random.RandomState(2)
        enhancer.enhance(rng.uniform(-0.3, 0.3, 30).astype(np.float32))
        sizes0 = enhancer._infer._cache_size()
        enhancer.enhance(rng.uniform(-0.3, 0.3, 3 * NS + 7).astype(np.float32))
        enhancer.enhance_batch(
            [rng.uniform(-0.3, 0.3, 2 * NS).astype(np.float32),
             rng.uniform(-0.3, 0.3, 11).astype(np.float32)]
        )
        assert enhancer._infer._cache_size() == sizes0 == 1


class TestLoadEnhancer:
    """load_enhancer: checkpoint -> serving Enhancer (packed canary path,
    few-step serving options)."""

    @pytest.fixture(scope="class")
    def run(self, tmp_path_factory):
        from sddm_tpu.train.checkpoints import save_checkpoint

        cfg = {
            "num_samples": NS,
            "sample_rate": 16000,
            "arch": {"type": "SDDM",
                     "args": {"p_transition": "condition_in",
                              "q_transition": "original"}},
            "diffusion": {"type": "GaussianDiffusion",
                          "args": {"schedule": "linear", "n_timestep": 4,
                                   "linear_start": 1e-6, "linear_end": 1e-3}},
            "network": {"type": "UNetModified2",
                        "args": {"inner_channel": 8, "norm_groups": 4,
                                 "channel_mults": [1, 2], "res_blocks": 1,
                                 "segment_len": 16, "segment_stride": 8}},
        }
        sched = DiffusionSchedule.create("linear", 4, 1e-6, 1e-3)
        net = UNetModified2(num_samples=NS, **{
            k: tuple(v) if isinstance(v, list) else v
            for k, v in cfg["network"]["args"].items()})
        model = SDDM(sched, net, p_transition="condition_in")
        params = model.init(jax.random.PRNGKey(0), (1, 1, NS))
        path = tmp_path_factory.mktemp("ckpt") / "model_best.ckpt"
        save_checkpoint(path, arch="SDDM", epoch=1, params=params,
                        opt_state={}, monitor_best=0.0, config=cfg)
        return path, cfg

    def test_packed_fewstep_serving(self, run):
        from sddm_tpu.enhance import load_enhancer

        path, cfg = run
        enh = load_enhancer(path, cfg, batch_rows=4, steps=2, ddim=True)
        # packed engine + DDIM 2-step schedule actually wired in
        assert enh.model.p_transition == "ddim"
        assert enh.model.diffusion.alpha_bar.shape[0] == 3
        out = enh.enhance(np.random.RandomState(0)
                          .uniform(-0.3, 0.3, NS + 5).astype(np.float32))
        assert out.shape == (NS + 5,) and np.isfinite(out).all()

    def test_default_full_sampler(self, run):
        from sddm_tpu.enhance import load_enhancer

        path, cfg = run
        enh = load_enhancer(path, cfg, batch_rows=4, packed=False)
        assert enh.model.p_transition == "condition_in"
        assert enh.model.diffusion.alpha_bar.shape[0] == 5
