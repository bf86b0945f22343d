"""End-to-end sampler OUTPUT parity against the torch reference.

Per-component parity (tables, transition means, q given same noise, network
forward with imported weights) is proven elsewhere; this test closes the
composition gap: imported reference weights + ONE shared injected noise
stream -> the reference's sequential ``model.infer``
(/root/reference/model/model.py:51-124) and our single-``lax.scan`` sampler
(sddm_tpu/models/sddm.py::SDDM.infer) must produce elementwise-matching
enhanced waveforms.  A transposed index or off-by-one anywhere in the scan
wiring that every per-component test tolerates would fail here.

The shared stream is captured by monkeypatching ``torch.randn_like`` to a
deterministic recorder; the recorded draws feed ``SDDM.infer(...,
noise_stream=)``.  The reference draws once for x_T (condition_in /
conditional / original|sr3 pure-noise init; supportive draws nothing,
model.py:57-68) then once per step for t = T..2 — never at t = 1
(diffusion.py:171-224 ``if t > 1``); our scan consumes a noise per step with
the t==1 draw gated off, so the t==1 slot is filled with zeros.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (scan sampler traces per mode)

REF = Path("/root/reference")
torch = pytest.importorskip("torch")
if not REF.exists():
    pytest.skip("reference checkout not available", allow_module_level=True)
sys.path.insert(0, str(REF))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from model.UNetModified2 import UNetModified2 as RefUNet  # noqa: E402
from model.diffusion import GaussianDiffusion as RefDiffusion  # noqa: E402
from model.model import SDDM as RefSDDM  # noqa: E402

from sddm_tpu.compat import import_unet_modified2_state  # noqa: E402
from sddm_tpu.diffusion.schedule import DiffusionSchedule  # noqa: E402
from sddm_tpu.models import SDDM, UNetModified2  # noqa: E402

NUM_SAMPLES = 208  # 12 frames of 32 @ stride 16
INNER = 8
MULTS = (1, 2)
T = 5
BATCH = 2


class _NoiseRecorder:
    """Deterministic stand-in for torch.randn_like that records its draws."""

    def __init__(self, seed=0):
        self.rng = np.random.RandomState(seed)
        self.draws = []

    def __call__(self, x, **kwargs):
        n = self.rng.standard_normal(tuple(x.shape)).astype(np.float32)
        self.draws.append(n)
        return torch.from_numpy(n)


@pytest.fixture(scope="module")
def nets():
    torch.manual_seed(0)
    ref_net = RefUNet(
        num_samples=NUM_SAMPLES, in_channel=2, out_channel=1,
        inner_channel=INNER, norm_groups=4, channel_mults=MULTS,
        res_blocks=1, dropout=0, segment_len=32, segment_stride=16,
    ).eval()
    our_net = UNetModified2(
        num_samples=NUM_SAMPLES, inner_channel=INNER, norm_groups=4,
        channel_mults=MULTS, res_blocks=1, segment_len=32, segment_stride=16,
    )
    params = import_unet_modified2_state(
        ref_net.state_dict(), channel_mults=MULTS, res_blocks=1,
        inner_channel=INNER, prefix="",
    )
    return ref_net, our_net, params


SCHED_ARGS = dict(schedule="linear", n_timestep=T,
                  linear_start=1e-4, linear_end=0.09)


def _run_pair(nets, p_transition, noise_condition, monkeypatch):
    ref_net, our_net, params = nets
    ref_model = RefSDDM(
        RefDiffusion(device="cpu", **SCHED_ARGS), ref_net,
        noise_condition=noise_condition, p_transition=p_transition,
    ).eval()
    our_model = SDDM(
        DiffusionSchedule.create(**SCHED_ARGS), our_net,
        noise_condition=noise_condition, p_transition=p_transition,
    )

    rng = np.random.RandomState(7)
    cond = rng.uniform(-0.5, 0.5, (BATCH, 1, NUM_SAMPLES)).astype(np.float32)

    rec = _NoiseRecorder(seed=3)
    monkeypatch.setattr(torch, "randn_like", rec)
    with torch.no_grad():
        ref_out = ref_model.infer(torch.from_numpy(cond)).numpy()

    draws = list(rec.draws)
    if p_transition == "supportive":
        x_T_noise = None  # x_T = condition, no draw (model.py:65-66)
    else:
        x_T_noise = jnp.asarray(draws.pop(0))
    # reference steps t = T..2 each drew once; t = 1 drew nothing -> zeros
    assert len(draws) == T - 1
    step_noises = jnp.asarray(
        np.stack(draws + [np.zeros_like(cond)], axis=0)
    )

    our_out = np.asarray(
        jax.jit(our_model.infer)(
            params, jax.random.PRNGKey(0), jnp.asarray(cond),
            noise_stream=(x_T_noise, step_noises),
        )
    )
    assert our_out.shape == ref_out.shape
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("p_transition", [
    "condition_in", "conditional", "original", "sr3", "supportive",
])
def test_sampler_output_parity(nets, p_transition, monkeypatch):
    _run_pair(nets, p_transition, "sqrt_alpha_bar", monkeypatch)


def test_sampler_output_parity_time_step(nets, monkeypatch):
    """time_step noise conditioning through the full chain (model.py:110-115)."""
    _run_pair(nets, "condition_in", "time_step", monkeypatch)
