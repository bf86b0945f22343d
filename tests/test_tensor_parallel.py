"""Channel tensor parallelism (parallel/tensor.py) on the virtual 8-device
CPU mesh: sharding placement, loss equivalence vs data-parallel, and the
Trainer wiring via a 2-D mesh.

The reference has no model-parallel capability (its distributed story is
single-process DataParallel, reference train.py:43-44); these tests cover
the TPU-native scaling axis beyond it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from sddm_tpu.diffusion import DiffusionSchedule
from sddm_tpu.models import SDDM, UNetModified2
from sddm_tpu.models.losses import l1_loss
from sddm_tpu.parallel import (
    MODEL_AXIS,
    make_mesh,
    make_mesh_2d,
    replicate,
    shard_batch,
    shard_state,
)
from sddm_tpu.parallel.tensor import leaf_spec
from sddm_tpu.train import make_optimizer
from sddm_tpu.train.state import TrainState

NUM_SAMPLES = 72


def tiny_model(n_timestep=3):
    sched = DiffusionSchedule.create("linear", n_timestep, 1e-6, 1e-3)
    net = UNetModified2(
        num_samples=NUM_SAMPLES, inner_channel=8, norm_groups=4,
        channel_mults=(1, 2), res_blocks=1, segment_len=16, segment_stride=8,
    )
    return SDDM(sched, net, p_transition="condition_in")


def make_step(model, tx):
    def train_step(state, key, target, condition):
        def loss_fn(params):
            predicted, noise = model.forward(
                params, key, target, condition, deterministic=False
            )
            return l1_loss(predicted, noise)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params,
                       opt_state=opt_state),
            loss,
        )

    return train_step


class TestLeafSpec:
    def test_channel_arrays_sharded(self):
        assert leaf_spec(np.zeros((3, 3, 16, 32)), 4) == P(
            None, None, None, MODEL_AXIS
        )
        assert leaf_spec(np.zeros((16, 64)), 4) == P(None, MODEL_AXIS)
        assert leaf_spec(np.zeros((32,)), 4) == P(MODEL_AXIS)

    def test_indivisible_and_scalars_replicated(self):
        assert leaf_spec(np.zeros((3, 3, 16, 30)), 4) == P()
        assert leaf_spec(np.zeros((2,)), 4) == P()
        assert leaf_spec(np.float32(0.0), 4) == P()


@pytest.mark.slow  # compiles the GSPMD-partitioned step twice on CPU
class TestTensorParallelStep:
    def test_loss_matches_data_parallel(self):
        assert jax.device_count() == 8
        model = tiny_model()
        tx = optax.amsgrad(1e-3)
        step = make_step(model, tx)
        batch = 8
        params = model.init(jax.random.PRNGKey(0), (batch, 1, NUM_SAMPLES))
        rng = np.random.default_rng(0)
        target = jnp.asarray(rng.normal(size=(batch, 1, NUM_SAMPLES)) * 0.1,
                             jnp.float32)
        condition = target + 0.02
        key = jax.random.PRNGKey(7)

        results = {}
        for name, mesh in (
            ("dp", make_mesh(8)),
            ("tp", make_mesh_2d(2, 4)),
        ):
            state = TrainState.create(
                jax.tree_util.tree_map(jnp.copy, params), tx
            )
            state = (
                shard_state(state, mesh)
                if MODEL_AXIS in mesh.axis_names
                else replicate(state, mesh)
            )
            b = shard_batch((target, condition), mesh)
            new_state, loss = jax.jit(step)(state, key, *b)
            results[name] = (
                float(loss),
                jax.tree_util.tree_map(np.asarray, new_state.params),
            )

        assert np.isfinite(results["dp"][0])
        assert abs(results["dp"][0] - results["tp"][0]) < 1e-5
        # parameters after one optimizer step agree elementwise
        flat_dp = jax.tree_util.tree_leaves(results["dp"][1])
        flat_tp = jax.tree_util.tree_leaves(results["tp"][1])
        for a, b_ in zip(flat_dp, flat_tp):
            np.testing.assert_allclose(a, b_, atol=2e-5, rtol=2e-5)

    def test_weights_are_actually_sharded(self):
        model = tiny_model()
        tx = optax.amsgrad(1e-3)
        mesh = make_mesh_2d(2, 4)
        params = model.init(jax.random.PRNGKey(0), (4, 1, NUM_SAMPLES))
        state = shard_state(TrainState.create(params, tx), mesh)
        specs = jax.tree_util.tree_map(
            lambda x: x.sharding.spec, state.params
        )
        flat = jax.tree_util.tree_leaves_with_path(specs)
        sharded = [p for p, s in flat if s != P()]
        assert sharded, "no parameter ended up channel-sharded"
        # every divisible last axis is sharded on the model axis
        for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
            spec = leaf.sharding.spec
            if leaf.ndim >= 1 and leaf.shape[-1] % 4 == 0:
                assert spec[-1] == MODEL_AXIS, (path, spec)


@pytest.mark.slow
class TestTrainerMeshWiring:
    def test_trainer_accepts_2d_mesh(self, tmp_path):
        from tests.test_train import build_trainer, make_config

        # reuse the train-test fixtures' corpus layout
        import tests.test_train as tt

        rng = np.random.RandomState(0)
        root = tmp_path / "data"
        for sub in ("clean", "noisy"):
            (root / sub).mkdir(parents=True)
        from sddm_tpu.data import save_wav

        for i in range(8):
            clean = rng.uniform(-0.5, 0.5, 200).astype(np.float32)
            save_wav(root / "clean" / f"u{i}.wav", clean, 16000)
            save_wav(root / "noisy" / f"u{i}.wav",
                     clean + 0.05 * rng.randn(200).astype(np.float32), 16000)

        cfg = make_config(tmp_path, epochs=1, valid_period=100)
        trainer, _ = build_trainer(cfg, root, run_id="tp0")
        trainer.mesh = make_mesh_2d(2, 4)
        trainer.state = shard_state(
            jax.tree_util.tree_map(np.asarray, trainer.state), trainer.mesh
        )
        batch = next(iter(trainer.data_loader))
        t, c = shard_batch(
            (jnp.asarray(batch[0]), jnp.asarray(batch[1])), trainer.mesh
        )
        trainer.key, k = jax.random.split(trainer.key)
        state, loss = trainer._train_step(trainer.state, k, t, c)
        assert np.isfinite(float(loss))
        leaf = state.params["params"]["Conv_0"]["kernel"]
        assert leaf.sharding.spec[-1] == MODEL_AXIS
