"""Checkpoint-import parity: load reference PyTorch UNetModified2 weights
into the Flax network and compare forward outputs elementwise — the strongest
architectural-parity check."""

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

from model.UNetModified2 import UNetModified2 as RefUNet  # noqa: E402

from sddm_tpu.compat import import_unet_modified2_state  # noqa: E402
from sddm_tpu.models import UNetModified2  # noqa: E402

NUM_SAMPLES = 208  # 12 frames of 32 @ stride 16
INNER = 8
MULTS = (1, 2)
RES_BLOCKS = 1


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    ref = RefUNet(
        num_samples=NUM_SAMPLES, in_channel=2, out_channel=1,
        inner_channel=INNER, norm_groups=4, channel_mults=MULTS,
        res_blocks=RES_BLOCKS, dropout=0, segment_len=32, segment_stride=16,
    ).eval()
    ours = UNetModified2(
        num_samples=NUM_SAMPLES, inner_channel=INNER, norm_groups=4,
        channel_mults=MULTS, res_blocks=RES_BLOCKS, segment_len=32,
        segment_stride=16,
    )
    params = import_unet_modified2_state(
        ref.state_dict(), channel_mults=MULTS, res_blocks=RES_BLOCKS,
        inner_channel=INNER, prefix="",
    )
    return ref, ours, params


class TestImportedWeights:
    def test_param_count_matches(self, models):
        ref, ours, params = models
        n_ref = sum(p.numel() for p in ref.parameters())
        n_ours = sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(params)
        )
        assert n_ref == n_ours

    def test_structure_covers_init(self, models):
        """Imported tree must exactly match the shapes of a fresh init."""
        ref, ours, params = models
        init = ours.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 1, NUM_SAMPLES)),
            jnp.zeros((1, 1, NUM_SAMPLES)),
            jnp.ones((1, 1, 1)),
        )
        init_shapes = jax.tree_util.tree_map(lambda x: x.shape, init)
        got_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
        assert init_shapes == got_shapes

    def test_forward_outputs_match(self, models):
        ref, ours, params = models
        rng = np.random.RandomState(0)
        cond = rng.uniform(-0.5, 0.5, (2, 1, NUM_SAMPLES)).astype(np.float32)
        x_t = rng.uniform(-0.5, 0.5, (2, 1, NUM_SAMPLES)).astype(np.float32)
        level = np.full((2, 1, 1), 0.7, np.float32)

        with torch.no_grad():
            ref_out = ref(
                torch.from_numpy(cond), torch.from_numpy(x_t),
                torch.from_numpy(level),
            ).numpy()
        our_out = np.asarray(
            ours.apply(params, jnp.asarray(cond), jnp.asarray(x_t),
                       jnp.asarray(level))
        )
        assert our_out.shape == ref_out.shape
        np.testing.assert_allclose(our_out, ref_out, rtol=1e-3, atol=1e-4)

    def test_flagship_size_import(self):
        """Full-size flagship config imports cleanly (shapes only)."""
        torch.manual_seed(1)
        ref = RefUNet(
            num_samples=16448, inner_channel=32, norm_groups=32,
            channel_mults=(1, 2, 3, 4, 5), res_blocks=1, segment_len=128,
            segment_stride=64,
        )
        params = import_unet_modified2_state(
            ref.state_dict(), channel_mults=(1, 2, 3, 4, 5), res_blocks=1,
            inner_channel=32, prefix="",
        )
        n_ref = sum(p.numel() for p in ref.parameters())
        n_ours = sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(params)
        )
        assert n_ref == n_ours
