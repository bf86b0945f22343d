"""Torch-checkpoint import parity for three more architecture families
(VERDICT #4): DiffWave (dilated-conv vocoder), WaveGrad (FiLM + resample),
TSTNN (dual-path transformer with GRU FFN).  With imported weights both
implementations must match elementwise."""

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

from sddm_tpu.compat.zoo_import import (  # noqa: E402
    import_diffwave_state,
    import_tstnn_state,
    import_wavegrad_state,
)


def _count(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


class TestDiffWaveImport:
    @pytest.fixture(scope="class")
    def pair(self):
        from model.diffwave import DiffWave as RefDiffWave

        from sddm_tpu.models import DiffWave

        torch.manual_seed(0)
        ref = RefDiffWave(
            num_samples=0, num_timesteps=10, freq_bins=8,
            residual_channels=8, residual_layers=3, dilation_cycle_length=2,
        ).eval()
        ours = DiffWave(freq_bins=8, residual_channels=8, residual_layers=3,
                        dilation_cycle_length=2)
        params = import_diffwave_state(ref.state_dict(), residual_layers=3,
                                       prefix="")
        return ref, ours, params

    def test_param_count(self, pair):
        ref, _, params = pair
        assert _count(params) == sum(p.numel() for p in ref.parameters())

    def test_forward_outputs_match(self, pair):
        ref, ours, params = pair
        rng = np.random.RandomState(0)
        frames = 4
        t_len = frames * 256  # upsampler: 2 stages of 16x
        spec = rng.uniform(-1, 1, (2, 8, frames)).astype(np.float32)
        audio = rng.uniform(-0.5, 0.5, (2, 1, t_len)).astype(np.float32)
        step = np.full((2, 1, 1), 7.0, np.float32)

        with torch.no_grad():
            ref_out = ref(
                torch.from_numpy(spec), torch.from_numpy(audio),
                torch.from_numpy(step),
            ).numpy()
        ours_out = np.asarray(
            ours.apply(params, jnp.asarray(spec), jnp.asarray(audio),
                       jnp.asarray(step))
        )
        assert ours_out.shape == ref_out.shape
        np.testing.assert_allclose(ours_out, ref_out, rtol=1e-3, atol=1e-4)


class TestWaveGradImport:
    """The reference WaveGrad has a fixed full-size topology (15M params,
    wavegrad.py:140-165) — run one short-audio forward through both."""

    @pytest.fixture(scope="class")
    def pair(self):
        from model.wavegrad import WaveGrad as RefWaveGrad

        from sddm_tpu.models import WaveGrad

        torch.manual_seed(0)
        ref = RefWaveGrad().eval()
        ours = WaveGrad()
        params = import_wavegrad_state(ref.state_dict(), prefix="")
        return ref, ours, params

    def test_param_count(self, pair):
        ref, _, params = pair
        assert _count(params) == sum(p.numel() for p in ref.parameters())

    def test_forward_outputs_match(self, pair):
        ref, ours, params = pair
        rng = np.random.RandomState(1)
        frames = 2
        t_len = frames * 300  # hop = 5*5*3*2*2
        spec = rng.uniform(-1, 1, (2, 128, frames)).astype(np.float32)
        audio = rng.uniform(-0.5, 0.5, (2, t_len)).astype(np.float32)
        level = np.full((2,), 0.6, np.float32)

        with torch.no_grad():
            # reference forward unsqueezes audio itself (wavegrad.py:168)
            ref_out = ref(
                torch.from_numpy(spec), torch.from_numpy(audio),
                torch.from_numpy(level),
            ).numpy()
        ours_out = np.asarray(
            ours.apply(params, jnp.asarray(spec),
                       jnp.asarray(audio[:, None, :]),
                       jnp.asarray(level))
        )
        assert ours_out.reshape(ref_out.shape).shape == ref_out.shape
        np.testing.assert_allclose(
            ours_out.reshape(ref_out.shape), ref_out, rtol=1e-3, atol=1e-4
        )


class TestTSTNNImport:
    @pytest.fixture(scope="class")
    def pair(self):
        from model.tstnn import TSTNN as RefTSTNN

        from sddm_tpu.models import TSTNN

        torch.manual_seed(0)
        ref = RefTSTNN(num_samples=72, F=16, stride=8, n_channels=8).eval()
        ours = TSTNN(num_samples=72, F=16, stride=8, n_channels=8)
        params = import_tstnn_state(ref.state_dict(), prefix="")
        return ref, ours, params

    def test_param_count(self, pair):
        """flax GRUCell folds torch's b_hr/b_hz into the ir/iz biases (the
        summed linears make this exact), so each GRU direction stores 2H
        fewer scalars: 8 encoder layers x 2 directions x 2H (H=2*d_model)."""
        ref, _, params = pair
        d_model = 8 // 2
        fold_deficit = 8 * 2 * 2 * (2 * d_model)
        assert _count(params) == (
            sum(p.numel() for p in ref.parameters()) - fold_deficit
        )

    def test_forward_outputs_match(self, pair):
        ref, ours, params = pair
        rng = np.random.RandomState(2)
        cond = rng.uniform(-0.5, 0.5, (2, 1, 72)).astype(np.float32)
        x_t = rng.uniform(-0.5, 0.5, (2, 1, 72)).astype(np.float32)
        level = np.full((2, 1, 1), 0.7, np.float32)

        with torch.no_grad():
            ref_out = ref(
                torch.from_numpy(cond), torch.from_numpy(x_t),
                torch.from_numpy(level),
            ).numpy()
        ours_out = np.asarray(
            ours.apply(params, jnp.asarray(cond), jnp.asarray(x_t),
                       jnp.asarray(level))
        )
        assert ours_out.shape == ref_out.shape
        np.testing.assert_allclose(ours_out, ref_out, rtol=1e-3, atol=2e-4)


class TestCAUNetImport:
    @pytest.fixture(scope="class")
    def pair(self):
        from model.CAUNet import CAUNet as RefCAUNet

        from sddm_tpu.compat.zoo_import import import_caunet_state
        from sddm_tpu.models import CAUNet

        kw = dict(num_samples=104, inner_channel=8, n_encode_layers=2,
                  dense_depth=2, n_TSTB=1, segment_len=16, segment_stride=8)
        torch.manual_seed(0)
        ref = RefCAUNet(**kw).eval()
        ours = CAUNet(**kw)
        params = import_caunet_state(
            ref.state_dict(), n_encode_layers=2, dense_depth=2, n_TSTB=1,
            prefix="",
        )
        return ref, ours, params

    def test_param_count(self, pair):
        """Same GRU bias-fold deficit as TSTNN: 2 encoder layers (row+col)
        x 2 directions x 2H with H = 2*d_model, d_model = inner//2."""
        ref, _, params = pair
        d_model = 8 // 2
        fold_deficit = 2 * 2 * 2 * (2 * d_model)
        assert _count(params) == (
            sum(p.numel() for p in ref.parameters()) - fold_deficit
        )

    def test_forward_outputs_match(self, pair):
        ref, ours, params = pair
        rng = np.random.RandomState(3)
        cond = rng.uniform(-0.5, 0.5, (2, 1, 104)).astype(np.float32)
        x_t = rng.uniform(-0.5, 0.5, (2, 1, 104)).astype(np.float32)
        level = np.full((2, 1, 1), 0.7, np.float32)

        with torch.no_grad():
            ref_out = ref(
                torch.from_numpy(cond), torch.from_numpy(x_t),
                torch.from_numpy(level),
            ).numpy()
        ours_out = np.asarray(
            ours.apply(params, jnp.asarray(cond), jnp.asarray(x_t),
                       jnp.asarray(level))
        )
        assert ours_out.shape == ref_out.shape
        np.testing.assert_allclose(ours_out, ref_out, rtol=1e-3, atol=2e-4)


class TestUNetModifiedImport:
    """SR3-style attention UNet (reference model/UNetModified.py:186-323):
    the 2-D self-attention einsum + blocked qkv head layout is the
    distinct risk here."""

    @pytest.fixture(scope="class")
    def pair(self):
        from model.UNetModified import UNetModified as RefUNetModified

        from sddm_tpu.compat.torch_import import import_unet_modified_state
        from sddm_tpu.models import UNetModified

        kw = dict(num_samples=104, inner_channel=8, norm_groups=4,
                  channel_mults=(1, 2), res_blocks=1, dropout=0,
                  segment_len=16, segment_stride=8)
        torch.manual_seed(0)
        ref = RefUNetModified(attn_layer=(0, 1), **kw).eval()
        ours = UNetModified(attn_layer=(0, 1), **kw)
        params = import_unet_modified_state(
            ref.state_dict(), channel_mults=(1, 2), attn_layer=(0, 1),
            res_blocks=1, inner_channel=8, prefix="",
        )
        return ref, ours, params

    def test_param_count(self, pair):
        ref, _, params = pair
        assert _count(params) == sum(p.numel() for p in ref.parameters())

    def test_structure_covers_init(self, pair):
        ref, ours, params = pair
        init = ours.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 1, 104)), jnp.zeros((1, 1, 104)),
            jnp.ones((1, 1, 1)),
        )
        init_shapes = jax.tree_util.tree_map(lambda x: x.shape, init)
        got_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
        assert init_shapes == got_shapes

    def test_forward_outputs_match(self, pair):
        ref, ours, params = pair
        rng = np.random.RandomState(4)
        cond = rng.uniform(-0.5, 0.5, (2, 1, 104)).astype(np.float32)
        x_t = rng.uniform(-0.5, 0.5, (2, 1, 104)).astype(np.float32)
        level = np.full((2, 1, 1), 0.7, np.float32)

        with torch.no_grad():
            ref_out = ref(
                torch.from_numpy(cond), torch.from_numpy(x_t),
                torch.from_numpy(level),
            ).numpy()
        ours_out = np.asarray(
            ours.apply(params, jnp.asarray(cond), jnp.asarray(x_t),
                       jnp.asarray(level))
        )
        assert ours_out.shape == ref_out.shape
        np.testing.assert_allclose(ours_out, ref_out, rtol=1e-3, atol=2e-4)


class TestWaveunetImport:
    """FiLM Wave-U-Net (reference model/waveunet.py:358-506): learned
    transposed-conv resampling (the shipped config_waveunet.json path) and
    the fixed sinc-resampler variant."""

    @pytest.fixture(scope="class")
    def pair(self):
        from model.waveunet import Waveunet as RefWaveunet

        from sddm_tpu.compat.zoo_import import import_waveunet_state
        from sddm_tpu.models import Waveunet

        torch.manual_seed(0)
        ref = RefWaveunet(2, [8, 16, 24], 5, 64, "gn", "learned",
                          depth=1).eval()
        ours = Waveunet(num_inputs=2, num_channels=(8, 16, 24),
                        kernel_size=5, conv_type="gn", res="learned",
                        depth=1)
        params = import_waveunet_state(
            ref.state_dict(), num_levels=3, depth=1, conv_type="gn",
            res="learned", prefix="",
        )
        return ref, ours, params

    def test_param_count(self, pair):
        ref, _, params = pair
        assert _count(params) == sum(p.numel() for p in ref.parameters())

    def test_forward_outputs_match(self, pair):
        ref, ours, params = pair
        rng = np.random.RandomState(5)
        cond = rng.uniform(-0.5, 0.5, (2, 1, 64)).astype(np.float32)
        x_t = rng.uniform(-0.5, 0.5, (2, 1, 64)).astype(np.float32)
        level = np.full((2, 1, 1), 0.7, np.float32)

        with torch.no_grad():
            ref_out = ref(
                torch.from_numpy(cond), torch.from_numpy(x_t),
                torch.from_numpy(level),
            ).numpy()
        ours_out = np.asarray(
            ours.apply(params, jnp.asarray(cond), jnp.asarray(x_t),
                       jnp.asarray(level))
        )
        assert ours_out.shape == ref_out.shape
        np.testing.assert_allclose(ours_out, ref_out, rtol=1e-3, atol=2e-4)

    def test_resample_sinc_matches(self):
        """ResampleSinc down + transpose legs vs the reference module in
        isolation (waveunet.py:107-160).  The full res='fixed' Waveunet is
        untestable end-to-end: the reference ctor's geometry self-check
        (waveunet.py:401-426) uses a get_output_size that omits the sinc
        stride division, so construction ALWAYS asserts — res='fixed' is
        dead code in the reference (shipped configs use 'learned')."""
        from model.waveunet import ResampleSinc as RefResample

        from sddm_tpu.models.waveunet import ResampleSinc

        rng = np.random.RandomState(7)
        x = rng.uniform(-1, 1, (2, 8, 65)).astype(np.float32)

        ref_dn = RefResample(8, 15, 2).eval()
        with torch.no_grad():
            r = ref_dn(torch.from_numpy(x)).numpy()
        ours_dn = ResampleSinc(8, 15, 2)
        o = np.asarray(ours_dn.apply(
            {}, jnp.asarray(x.transpose(0, 2, 1))
        )).transpose(0, 2, 1)
        np.testing.assert_allclose(o, r, rtol=1e-4, atol=1e-5)

        y = rng.uniform(-1, 1, (2, 8, 33)).astype(np.float32)
        ref_up = RefResample(8, 15, 2, transpose=True).eval()
        with torch.no_grad():
            r = ref_up(torch.from_numpy(y)).numpy()
        ours_up = ResampleSinc(8, 15, 2, transpose=True)
        o = np.asarray(ours_up.apply(
            {}, jnp.asarray(y.transpose(0, 2, 1))
        )).transpose(0, 2, 1)
        np.testing.assert_allclose(o, r, rtol=1e-4, atol=1e-5)


class TestUNetVariableImport:
    """Per-segment variable-noise UNet (reference
    model/UNetModified2_withVariableNoiseLevel.py:114-242): the parallel
    noise-level pyramid is the distinct risk; backs the SNR-adaptive CLI
    pair."""

    @pytest.fixture(scope="class")
    def pair(self):
        from model.UNetModified2_withVariableNoiseLevel import (
            UNetModified2_VariableNoiseLevel as RefVar,
        )

        from sddm_tpu.compat.torch_import import import_unet_variable_state
        from sddm_tpu.models import UNetModified2_VariableNoiseLevel

        torch.manual_seed(0)
        ref = RefVar(in_channel=2, out_channel=1, inner_channel=8,
                     norm_groups=4, channel_mults=(1, 2), res_blocks=1,
                     dropout=0).eval()
        ours = UNetModified2_VariableNoiseLevel(
            inner_channel=8, norm_groups=4, channel_mults=(1, 2),
            res_blocks=1,
        )
        params = import_unet_variable_state(
            ref.state_dict(), channel_mults=(1, 2), res_blocks=1,
            inner_channel=8, prefix="",
        )
        return ref, ours, params

    def test_param_count(self, pair):
        ref, _, params = pair
        assert _count(params) == sum(p.numel() for p in ref.parameters())

    def test_structure_covers_init(self, pair):
        ref, ours, params = pair
        init = ours.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 1, 8, 16)), jnp.zeros((1, 1, 8, 16)),
            jnp.ones((1, 1, 8, 1)),
        )
        init_shapes = jax.tree_util.tree_map(lambda x: x.shape, init)
        got_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
        assert init_shapes == got_shapes

    def _run(self, pair):
        ref, ours, params = pair
        rng = np.random.RandomState(8)
        cond = rng.uniform(-0.5, 0.5, (2, 1, 8, 16)).astype(np.float32)
        x_t = rng.uniform(-0.5, 0.5, (2, 1, 8, 16)).astype(np.float32)
        level = rng.uniform(0.1, 0.9, (2, 1, 8, 1)).astype(np.float32)

        with torch.no_grad():
            ref_out = ref(
                torch.from_numpy(cond), torch.from_numpy(x_t),
                torch.from_numpy(level),
            ).numpy()
        ours_out = np.asarray(
            ours.apply(params, jnp.asarray(cond), jnp.asarray(x_t),
                       jnp.asarray(level))
        )
        assert ours_out.shape == ref_out.shape
        return ours_out, ref_out

    def test_forward_outputs_close(self, pair):
        """Unmodified comparison.  The 1e7-scale positional encoding
        (UNetModified2_withVariableNoiseLevel.py:17) computes sin/cos of
        ~1e7-magnitude f32 arguments; torch's powf builds the frequency
        vector 1 ulp off the correctly-rounded value (measured), which
        shifts those arguments by O(0.2) rad — an ill-conditioning inherent
        to the reference design (its own CPU-vs-CUDA runs diverge the same
        way).  Hence the loose tolerance here; exactness of everything
        downstream is proven by test_forward_outputs_match_synced_pe."""
        ours_out, ref_out = self._run(pair)
        np.testing.assert_allclose(ours_out, ref_out, rtol=5e-2, atol=2e-2)

    def test_forward_outputs_match_synced_pe(self, pair):
        """Sync the reference's PE frequency vector to ours, then require
        elementwise equality — isolates the powf-ulp divergence and proves
        the rest of the network matches exactly."""
        ref, ours, params = pair
        half = 128 // 2
        step = np.arange(half, dtype=np.float32)
        vec = np.asarray(1e7 * 10.0 ** (-step * 4.0 / half), np.float32)
        pe = ref.noise_level_mlp[0]
        old = pe.embedding_vector
        pe.embedding_vector = torch.from_numpy(vec).view(1, -1, 1, 1)
        try:
            ours_out, ref_out = self._run(pair)
        finally:
            pe.embedding_vector = old
        np.testing.assert_allclose(ours_out, ref_out, rtol=1e-3, atol=2e-4)


class TestUNetSPImport:
    """Sub-pixel-shuffle UNet (reference model/UNet_SubpixelConv.py:141-267):
    PixelShuffle channel->space ordering is the distinct risk."""

    @pytest.fixture(scope="class")
    def pair(self):
        from model.UNet_SubpixelConv import UNetSP as RefUNetSP

        from sddm_tpu.compat.torch_import import import_unet_sp_state
        from sddm_tpu.models import UNetSP

        kw = dict(num_samples=104, inner_channel=8, norm_groups=4,
                  channel_mults=(1, 2), res_blocks=1, dropout=0,
                  segment_len=16, segment_stride=8)
        torch.manual_seed(0)
        ref = RefUNetSP(**kw).eval()
        ours = UNetSP(**kw)
        params = import_unet_sp_state(
            ref.state_dict(), channel_mults=(1, 2), res_blocks=1,
            inner_channel=8, prefix="",
        )
        return ref, ours, params

    def test_param_count(self, pair):
        ref, _, params = pair
        assert _count(params) == sum(p.numel() for p in ref.parameters())

    def test_forward_outputs_match(self, pair):
        ref, ours, params = pair
        rng = np.random.RandomState(9)
        cond = rng.uniform(-0.5, 0.5, (2, 1, 104)).astype(np.float32)
        x_t = rng.uniform(-0.5, 0.5, (2, 1, 104)).astype(np.float32)
        level = np.full((2, 1, 1), 0.7, np.float32)

        with torch.no_grad():
            ref_out = ref(
                torch.from_numpy(cond), torch.from_numpy(x_t),
                torch.from_numpy(level),
            ).numpy()
        ours_out = np.asarray(
            ours.apply(params, jnp.asarray(cond), jnp.asarray(x_t),
                       jnp.asarray(level))
        )
        assert ours_out.shape == ref_out.shape
        np.testing.assert_allclose(ours_out, ref_out, rtol=1e-3, atol=2e-4)


class TestUNetTSTImport:
    """UNetModified2-style UNet with a Dual_Transformer mid (reference
    model/UNetTST.py:270-392): its output Sequential is Conv->PReLU
    (shared slope) — a third Dual_Transformer variant."""

    @pytest.fixture(scope="class")
    def pair(self):
        from model.UNetTST import UNetTST as RefUNetTST

        from sddm_tpu.compat.torch_import import import_unet_tst_state
        from sddm_tpu.models import UNetTST

        kw = dict(num_samples=104, inner_channel=8, norm_groups=4,
                  channel_mults=(1, 2), n_TSTB=1, res_blocks=1, dropout=0,
                  segment_len=16, segment_stride=8)
        torch.manual_seed(0)
        ref = RefUNetTST(**kw).eval()
        ours = UNetTST(**kw)
        params = import_unet_tst_state(
            ref.state_dict(), channel_mults=(1, 2), res_blocks=1,
            inner_channel=8, n_TSTB=1, prefix="",
        )
        return ref, ours, params

    def test_param_count(self, pair):
        """GRU bias-fold deficit: 2 encoder layers x 2 dirs x 2H, H=2*d
        with d = (inner*mults[-1])//2 = 8."""
        ref, _, params = pair
        d = (8 * 2) // 2
        fold_deficit = 2 * 2 * 2 * (2 * d)
        assert _count(params) == (
            sum(p.numel() for p in ref.parameters()) - fold_deficit
        )

    def test_forward_outputs_match(self, pair):
        ref, ours, params = pair
        rng = np.random.RandomState(10)
        cond = rng.uniform(-0.5, 0.5, (2, 1, 104)).astype(np.float32)
        x_t = rng.uniform(-0.5, 0.5, (2, 1, 104)).astype(np.float32)
        level = np.full((2, 1, 1), 0.7, np.float32)

        with torch.no_grad():
            ref_out = ref(
                torch.from_numpy(cond), torch.from_numpy(x_t),
                torch.from_numpy(level),
            ).numpy()
        ours_out = np.asarray(
            ours.apply(params, jnp.asarray(cond), jnp.asarray(x_t),
                       jnp.asarray(level))
        )
        assert ours_out.shape == ref_out.shape
        np.testing.assert_allclose(ours_out, ref_out, rtol=1e-3, atol=2e-4)


class TestSNREstimatorImport:
    """Per-segment SNR estimator (reference model/snr_estimator.py:70-129):
    the channel-major vs segment-major dense-head flattening is the
    distinct risk."""

    @pytest.fixture(scope="class")
    def pair(self):
        from model.snr_estimator import SNREstimator as RefSNR

        from sddm_tpu.compat.torch_import import import_snr_estimator_state
        from sddm_tpu.models import SNREstimator

        # geometry: after len(mults) halvings, N' (=8) must be >= L' (=4)
        # for the reference's (L',L') SNRBlock kernel to fit
        kw = dict(n_segments=32, segment_len=16, inner_channel=8,
                  norm_groups=4, channel_mults=(1, 2), res_blocks=1,
                  dropout=0)
        torch.manual_seed(0)
        ref = RefSNR(**kw).eval()
        ours = SNREstimator(**kw)
        params = import_snr_estimator_state(
            ref.state_dict(), channel_mults=(1, 2), res_blocks=1,
            inner_channel=8, prefix="",
        )
        return ref, ours, params

    def test_param_count(self, pair):
        ref, _, params = pair
        assert _count(params) == sum(p.numel() for p in ref.parameters())

    def test_forward_outputs_match(self, pair):
        ref, ours, params = pair
        rng = np.random.RandomState(11)
        x = rng.uniform(-0.5, 0.5, (2, 1, 32, 16)).astype(np.float32)

        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x)).numpy()
        ours_out = np.asarray(ours.apply(params, jnp.asarray(x)))
        assert ours_out.shape == ref_out.shape
        np.testing.assert_allclose(ours_out, ref_out, rtol=1e-3, atol=2e-4)


class TestDenoiseWaveGradImport:
    """Fixed full-size topologies (reference wavegrad.py:184-353); batch 1 and
    the shortest length each geometry divides keeps the CPU forward cheap."""

    # (version, ours class name, ref class name, input length)
    CASES = [
        (1, "DenoiseWaveGrad1", 400),   # y /80, x /400, up x400
        (2, "DenoiseWaveGrad2", 512),   # /256, up x256
        (3, "DenoiseWaveGrad3", 600),   # /60 + bottleneck /5, up x300
    ]

    @pytest.fixture(scope="class", params=CASES, ids=lambda c: f"v{c[0]}")
    def pair(self, request):
        version, name, t_len = request.param
        import model.wavegrad as ref_mod

        from sddm_tpu.compat.zoo_import import import_denoise_wavegrad_state
        import sddm_tpu.models as ours_mod

        torch.manual_seed(0)
        ref = getattr(ref_mod, name)().eval()
        ours = getattr(ours_mod, name)()
        params = import_denoise_wavegrad_state(
            ref.state_dict(), version=version, prefix=""
        )
        return ref, ours, params, t_len

    def test_param_count(self, pair):
        ref, _, params, _ = pair
        assert _count(params) == sum(p.numel() for p in ref.parameters())

    def test_forward_outputs_match(self, pair):
        ref, ours, params, t_len = pair
        rng = np.random.RandomState(4)
        cond = rng.uniform(-0.5, 0.5, (1, 1, t_len)).astype(np.float32)
        x_t = rng.uniform(-0.5, 0.5, (1, 1, t_len)).astype(np.float32)
        level = np.full((1,), 0.6, np.float32)

        with torch.no_grad():
            ref_out = ref(
                torch.from_numpy(cond), torch.from_numpy(x_t),
                torch.from_numpy(level),
            ).numpy()
        ours_out = np.asarray(
            ours.apply(params, jnp.asarray(cond), jnp.asarray(x_t),
                       jnp.asarray(level))
        )
        assert ours_out.shape == ref_out.shape
        np.testing.assert_allclose(ours_out, ref_out, rtol=1e-3, atol=3e-4)


class TestWaveunet2Import:
    """Waveunet2 = FiLM Wave-U-Net with wrapped resample layers
    (reference waveunet2.py:226-324); kernel-size knobs differ from Waveunet."""

    @pytest.fixture(scope="class")
    def pair(self):
        from model.waveunet2 import Waveunet2 as RefWaveunet2

        from sddm_tpu.compat.zoo_import import import_waveunet2_state
        from sddm_tpu.models import Waveunet2

        ch = [8, 16, 24]
        torch.manual_seed(0)
        ref = RefWaveunet2(
            num_inputs=2, num_channels=ch, downconv_kernel_size=5,
            upconv_kernel_size=5, bottleneck_kernel_size=5, conv_stride=1,
            conv_type="gn", depth=1,
        ).eval()
        ours = Waveunet2(num_inputs=2, num_channels=tuple(ch))
        params = import_waveunet2_state(
            ref.state_dict(), num_levels=3, depth=1, conv_type="gn",
            prefix="",
        )
        return ref, ours, params

    def test_param_count(self, pair):
        ref, _, params = pair
        assert _count(params) == sum(p.numel() for p in ref.parameters())

    def test_forward_outputs_match(self, pair):
        ref, ours, params = pair
        rng = np.random.RandomState(5)
        cond = rng.uniform(-0.5, 0.5, (2, 1, 64)).astype(np.float32)
        x_t = rng.uniform(-0.5, 0.5, (2, 1, 64)).astype(np.float32)
        level = np.full((2,), 0.6, np.float32)

        with torch.no_grad():
            ref_out = ref(
                torch.from_numpy(cond), torch.from_numpy(x_t),
                torch.from_numpy(level),
            ).numpy()
        ours_out = np.asarray(
            ours.apply(params, jnp.asarray(cond), jnp.asarray(x_t),
                       jnp.asarray(level))
        )
        assert ours_out.shape == ref_out.shape
        np.testing.assert_allclose(ours_out, ref_out, rtol=1e-3, atol=2e-4)


class TestWaveunet3Import:
    """ResnetBlocWithAttn Wave-U-Net with additive skips and raw-scalar
    noise level (reference waveunet3.py:314-416)."""

    @pytest.fixture(scope="class")
    def pair(self):
        from model.waveunet3 import Waveunet3 as RefWaveunet3

        from sddm_tpu.compat.zoo_import import import_waveunet3_state
        from sddm_tpu.models import Waveunet3

        ch = [4, 8, 16]
        torch.manual_seed(0)
        ref = RefWaveunet3(
            num_inputs=2, num_channels=ch, downconv_kernel_size=5,
            upconv_kernel_size=5, bottleneck_kernel_size=5, conv_stride=1,
            conv_type="gn", norm_groups=4, with_attn=True,
        ).eval()
        ours = Waveunet3(
            num_inputs=2, num_channels=tuple(ch), norm_groups=4,
            with_attn=True,
        )
        params = import_waveunet3_state(
            ref.state_dict(), num_channels=ch, num_inputs=2,
            with_attn=True, prefix="",
        )
        return ref, ours, params

    def test_param_count(self, pair):
        ref, _, params = pair
        assert _count(params) == sum(p.numel() for p in ref.parameters())

    def test_forward_outputs_match(self, pair):
        ref, ours, params = pair
        rng = np.random.RandomState(6)
        cond = rng.uniform(-0.5, 0.5, (2, 1, 64)).astype(np.float32)
        x_t = rng.uniform(-0.5, 0.5, (2, 1, 64)).astype(np.float32)
        # FeatureWiseAffine's Linear(1, C) needs a trailing singleton
        # (reference waveunet3.py:39-51) — the SDDM contract's [B,1,1]
        level = np.full((2, 1, 1), 0.6, np.float32)

        with torch.no_grad():
            ref_out = ref(
                torch.from_numpy(cond), torch.from_numpy(x_t),
                torch.from_numpy(level),
            ).numpy()
        ours_out = np.asarray(
            ours.apply(params, jnp.asarray(cond), jnp.asarray(x_t),
                       jnp.asarray(level))
        )
        assert ours_out.shape == ref_out.shape
        np.testing.assert_allclose(ours_out, ref_out, rtol=1e-3, atol=2e-4)
