"""Train-step parity vs the PyTorch reference: with imported weights and an
identical deterministic batch, the loss, per-parameter gradients, and the
parameters after one Adam(amsgrad) step must all match elementwise.

This is the property that determines whether N epochs of this framework land
at the same optimum as the reference (reference trainer/trainer.py:53-93:
loss -> backward -> optimizer.step with Adam(lr, amsgrad) from
config_unet.json). Forward parity alone (test_torch_import.py) is necessary
but not sufficient.
"""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
torch = pytest.importorskip("torch")
if not REF.exists():
    pytest.skip("reference checkout not available", allow_module_level=True)
sys.path.insert(0, str(REF))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from model.UNetModified2 import UNetModified2 as RefUNet  # noqa: E402

from sddm_tpu.compat import import_unet_modified2_state  # noqa: E402
from sddm_tpu.models import UNetModified2  # noqa: E402
from sddm_tpu.models.losses import l1_loss  # noqa: E402

NUM_SAMPLES = 208  # 12 frames of 32 @ stride 16
INNER = 8
MULTS = (1, 2)
RES_BLOCKS = 1
LR = 2e-3


def _map_named(tree_like_state_dict):
    """Run a {torch param name: array} dict through the SAME weight mapping
    used for checkpoint import — gradients and updated params transform
    identically to weights (transposes are linear)."""
    return import_unet_modified2_state(
        tree_like_state_dict, channel_mults=MULTS, res_blocks=RES_BLOCKS,
        inner_channel=INNER, prefix="",
    )


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    ref = RefUNet(
        num_samples=NUM_SAMPLES, in_channel=2, out_channel=1,
        inner_channel=INNER, norm_groups=4, channel_mults=MULTS,
        res_blocks=RES_BLOCKS, dropout=0, segment_len=32, segment_stride=16,
    )
    ours = UNetModified2(
        num_samples=NUM_SAMPLES, inner_channel=INNER, norm_groups=4,
        channel_mults=MULTS, res_blocks=RES_BLOCKS, segment_len=32,
        segment_stride=16,
    )
    params = _map_named(ref.state_dict())

    rng = np.random.RandomState(42)
    batch = {
        "cond": rng.uniform(-0.5, 0.5, (4, 1, NUM_SAMPLES)).astype(np.float32),
        "x_t": rng.uniform(-0.5, 0.5, (4, 1, NUM_SAMPLES)).astype(np.float32),
        "lvl": rng.uniform(0.3, 0.95, (4, 1, 1)).astype(np.float32),
        "noise": rng.normal(0, 1, (4, 1, NUM_SAMPLES)).astype(np.float32),
    }

    # ---- torch side: loss, grads, one Adam(amsgrad) step ----
    t = {k: torch.from_numpy(v) for k, v in batch.items()}
    opt = torch.optim.Adam(ref.parameters(), lr=LR, weight_decay=0,
                           amsgrad=True)
    out = ref(t["cond"], t["x_t"], t["lvl"])
    ref_loss = torch.nn.functional.l1_loss(out, t["noise"])
    ref_loss.backward()
    ref_grads = _map_named(
        {n: p.grad.detach().clone() for n, p in ref.named_parameters()}
    )
    opt.step()
    ref_params_after = _map_named(
        {n: p.detach().clone() for n, p in ref.named_parameters()}
    )

    # ---- jax side ----
    def loss_fn(p):
        pred = ours.apply(p, jnp.asarray(batch["cond"]),
                          jnp.asarray(batch["x_t"]), jnp.asarray(batch["lvl"]))
        return l1_loss(pred, jnp.asarray(batch["noise"]))

    our_loss, our_grads = jax.value_and_grad(loss_fn)(params)
    tx = optax.amsgrad(LR)
    opt_state = tx.init(params)
    updates, _ = tx.update(our_grads, opt_state, params)
    our_params_after = optax.apply_updates(params, updates)

    return dict(
        ref_loss=float(ref_loss.detach()), our_loss=float(our_loss),
        ref_grads=ref_grads, our_grads=our_grads,
        ref_params_after=ref_params_after, our_params_after=our_params_after,
    )


def _assert_trees_close(ours, ref, rtol, atol, what):
    flat_ours = jax.tree_util.tree_leaves_with_path(ours)
    flat_ref = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(ref)}
    assert len(flat_ours) == len(flat_ref)
    for key, leaf in flat_ours:
        name = jax.tree_util.keystr(key)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_ref[name]),
            rtol=rtol, atol=atol,
            err_msg=f"{what} mismatch at {name}",
        )


class TestTrainStepParity:
    def test_loss_matches(self, setup):
        np.testing.assert_allclose(setup["our_loss"], setup["ref_loss"],
                                   rtol=1e-4)

    def test_gradients_match(self, setup):
        _assert_trees_close(setup["our_grads"], setup["ref_grads"],
                            rtol=1e-3, atol=1e-5, what="gradient")

    def test_params_after_one_amsgrad_step_match(self, setup):
        _assert_trees_close(setup["our_params_after"],
                            setup["ref_params_after"],
                            rtol=1e-3, atol=2e-5, what="post-step param")
