"""Golden-shape tests for zoo part 2: UNetSP, UNetTST, CAUNet, Waveunet/2/3."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sddm_tpu.models import (
    CAUNet,
    UNetSP,
    UNetTST,
    Waveunet,
    Waveunet2,
    Waveunet3,
)
from sddm_tpu.models.unet_sp import pixel_shuffle


def _run(net, n, batch=1):
    x = jnp.zeros((batch, 1, n))
    nl = jnp.full((batch, 1, 1), 0.5)
    params = net.init(jax.random.PRNGKey(0), x, x, nl)
    return net.apply(params, x, x, nl)


class TestPixelShuffle:
    def test_matches_torch_semantics(self):
        # verify ch = c*r*r + i*r + j mapping on a tiny tensor
        r, c, h, w = 2, 1, 2, 2
        x = np.arange(1 * h * w * c * r * r, dtype=np.float32).reshape(
            1, h, w, c * r * r
        )
        out = np.asarray(pixel_shuffle(jnp.asarray(x), r))
        assert out.shape == (1, h * r, w * r, c)
        # out[0, 0, 0, 0] takes channel (i=0, j=0) of spatial (0,0)
        assert out[0, 0, 0, 0] == x[0, 0, 0, 0]
        # out[0, 0, 1, 0] -> (i=0, j=1) of (0,0)
        assert out[0, 0, 1, 0] == x[0, 0, 0, 1]
        # out[0, 1, 0, 0] -> (i=1, j=0) of (0,0)
        assert out[0, 1, 0, 0] == x[0, 0, 0, 2]


class TestUNetSP:
    def test_shape(self):
        n = (8 - 1) * 8 + 16  # 8 frames of 16
        net = UNetSP(
            num_samples=n, inner_channel=8, norm_groups=4,
            channel_mults=(1, 2), res_blocks=1, segment_len=16,
            segment_stride=8,
        )
        out = _run(net, n, 2)
        assert out.shape == (2, 1, n)


class TestUNetTST:
    def test_shape(self):
        n = (8 - 1) * 8 + 16
        net = UNetTST(
            num_samples=n, inner_channel=8, norm_groups=4,
            channel_mults=(1, 2), n_TSTB=1, res_blocks=1, segment_len=16,
            segment_stride=8,
        )
        out = _run(net, n)
        assert out.shape == (1, 1, n)


class TestCAUNet:
    def test_shape(self):
        n = (8 - 1) * 8 + 16
        net = CAUNet(
            num_samples=n, inner_channel=8, n_encode_layers=2,
            dense_depth=2, n_TSTB=1, segment_len=16, segment_stride=8,
        )
        out = _run(net, n)
        assert out.shape == (1, 1, n)


class TestWaveunetFamily:
    def test_waveunet(self):
        net = Waveunet(
            num_channels=(8, 16, 24), kernel_size=5, conv_type="gn",
            res="learned", depth=1, num_samples=64,
        )
        out = _run(net, 64)
        assert out.shape == (1, 1, 64)
        assert np.all(np.abs(np.asarray(out)) <= 1.0)  # eval-time clamp

    def test_waveunet_sinc(self):
        # sinc resampling only round-trips odd lengths (the reference asserts
        # input_size % stride == 1, waveunet.py:157)
        net = Waveunet(
            num_channels=(8, 16), kernel_size=5, conv_type="gn",
            res="fixed", depth=1,
        )
        out = _run(net, 65)
        assert out.shape == (1, 1, 65)

    def test_waveunet2(self):
        net = Waveunet2(num_channels=(8, 16, 24))
        out = _run(net, 64)
        assert out.shape == (1, 1, 64)

    def test_waveunet3(self):
        net = Waveunet3(num_channels=(4, 8, 16), norm_groups=4, with_attn=True)
        out = _run(net, 64)
        assert out.shape == (1, 1, 64)

    def test_waveunet3_channel_check(self):
        with pytest.raises(AssertionError):
            net = Waveunet3(num_channels=(8, 16), norm_groups=4)
            _run(net, 32)
