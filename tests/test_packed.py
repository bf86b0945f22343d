"""Exactness of the space-to-depth packed conv transforms (ops/packed.py):
every packed kernel must reproduce the unpacked op elementwise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sddm_tpu.ops.packed import (
    d2s,
    pack_input_map,
    pack_kernel_s1,
    pack_kernel_s2_packed_out,
    pack_kernel_s2_unpacked_out,
    pack_kernel_upsample,
    s2d,
)

B, N, F = 2, 8, 12


def conv(x, w, strides=(1, 1), padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


class TestS2D:
    def test_round_trip(self, rng):
        x = jnp.asarray(rng.randn(B, N, F, 3).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(d2s(s2d(x))), np.asarray(x))

    def test_phase_layout(self, rng):
        x = jnp.asarray(rng.randn(1, 4, 4, 2).astype(np.float32))
        p = np.asarray(s2d(x))
        # packed channel = (2a+b)*C + c
        assert p[0, 1, 1, 2 * 2 + 0] == x[0, 2 * 1 + 1, 2 * 1 + 0, 0]


class TestStride1:
    @pytest.mark.parametrize("ci,co", [(3, 5), (4, 4)])
    def test_3x3(self, rng, ci, co):
        x = jnp.asarray(rng.randn(B, N, F, ci).astype(np.float32))
        w = rng.randn(3, 3, ci, co).astype(np.float32)
        ref = conv(x, jnp.asarray(w))
        got = d2s(conv(s2d(x), jnp.asarray(pack_kernel_s1(w))))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_1x1(self, rng):
        x = jnp.asarray(rng.randn(B, N, F, 3).astype(np.float32))
        w = rng.randn(1, 1, 3, 6).astype(np.float32)
        ref = conv(x, jnp.asarray(w))
        got = d2s(conv(s2d(x), jnp.asarray(pack_kernel_s1(w))))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestStride2:
    def test_unpacked_out(self, rng):
        """Downsample: torch pad (1,1) stride 2."""
        x = jnp.asarray(rng.randn(B, N, F, 3).astype(np.float32))
        w = rng.randn(3, 3, 3, 5).astype(np.float32)
        ref = conv(x, jnp.asarray(w), strides=(2, 2),
                   padding=((1, 1), (1, 1)))
        got = conv(s2d(x), jnp.asarray(pack_kernel_s2_unpacked_out(w)),
                   padding=((1, 0), (1, 0)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_packed_out(self, rng):
        x = jnp.asarray(rng.randn(B, N, F, 3).astype(np.float32))
        w = rng.randn(3, 3, 3, 5).astype(np.float32)
        ref = conv(x, jnp.asarray(w), strides=(2, 2),
                   padding=((1, 1), (1, 1)))
        got = d2s(conv(s2d(x), jnp.asarray(pack_kernel_s2_packed_out(w)),
                       strides=(2, 2), padding=((1, 1), (1, 1))))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestUpsample:
    def test_nearest_up_conv(self, rng):
        x = jnp.asarray(rng.randn(B, N, F, 3).astype(np.float32))
        w = rng.randn(3, 3, 3, 5).astype(np.float32)
        up = jax.image.resize(x, (B, 2 * N, 2 * F, 3), method="nearest")
        ref = conv(up, jnp.asarray(w))
        got = d2s(conv(x, jnp.asarray(pack_kernel_upsample(w))))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestConcatMap:
    def test_concat_permutation(self, rng):
        x = jnp.asarray(rng.randn(B, N, F, 3).astype(np.float32))
        y = jnp.asarray(rng.randn(B, N, F, 5).astype(np.float32))
        ref = np.asarray(s2d(jnp.concatenate([x, y], axis=-1)))
        cat = np.asarray(jnp.concatenate([s2d(x), s2d(y)], axis=-1))
        perm = pack_input_map((3, 5))
        np.testing.assert_array_equal(cat[..., perm], ref)


class TestGNCancellation:
    """Regression: the packed GroupNorm must clamp its one-pass variance
    like flax's GroupNorm does.  With converged weights the sampler drives
    activations into |mean| >> std territory where E[x^2] - mean^2 cancels
    catastrophically to a tiny NEGATIVE f32 value; unclamped, rsqrt(neg+eps)
    is NaN (observed on chip as NaN output rows in 131/200 evaluation files
    with the trained flagship checkpoint — PERFORMANCE.md round 3)."""

    def _big_mean_input(self, rng, c):
        # mean ~ 3e3, std ~ 1e-2: mean^2/var ~ 1e11 >> 2^24 (f32 cancellation)
        x = 3e3 + 1e-2 * rng.randn(2, 8, 8, c).astype(np.float32)
        return jnp.asarray(x)

    def test_plain_plan_finite_and_matches_flax(self, rng):
        import flax.linen as nn

        from sddm_tpu.models.unet_packed import _GN

        c, groups = 16, 4
        x = self._big_mean_input(rng, c)
        gn = _GN(jnp.ones((c,)), jnp.zeros((c,)), groups)
        got = np.asarray(gn(x))
        assert np.isfinite(got).all()
        mod = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
        ref = np.asarray(mod.apply(
            {"params": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}}, x
        ))
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)

    def test_packed_plan_finite(self, rng):
        from sddm_tpu.models.unet_packed import _GN, _packed_gn_plan

        c, groups = 16, 4
        plan = _packed_gn_plan(groups, (c,))
        x = self._big_mean_input(rng, 4 * c)
        gn = _GN(jnp.ones((4 * c,)), jnp.zeros((4 * c,)), groups, plan)
        out = np.asarray(gn(x))
        assert np.isfinite(out).all()


class TestOffsetPhase:
    """Offset-phase res-block convs (ops/packed.py::pack_kernel_s1_to_offset
    / _from_offset): 2x2 packed kernels that hop to the offset grid and
    back, reproducing two chained SAME 3x3 convs elementwise with 2.25x
    fewer MACs than the dense 3x3 packed kernels."""

    def _chain(self, x, w1, w2, fn=None):
        from sddm_tpu.ops.packed import (
            offset_mask, pack_kernel_s1_from_offset, pack_kernel_s1_to_offset)

        xp = s2d(x)
        y = conv(xp, jnp.asarray(pack_kernel_s1_to_offset(w1)),
                 padding=((1, 1), (1, 1)))
        m = jnp.asarray(offset_mask(y.shape[1], y.shape[2],
                                    y.shape[3] // 4))
        y = y * m
        if fn is not None:
            y = fn(y) * m  # nonlinearity between the convs, re-masked
        out = conv(y, jnp.asarray(pack_kernel_s1_from_offset(w2)),
                   padding=((0, 0), (0, 0)))
        return d2s(out)

    @pytest.mark.parametrize("ci,cm,co", [(3, 5, 4), (4, 4, 4)])
    def test_chained_convs(self, rng, ci, cm, co):
        x = jnp.asarray(rng.randn(B, N, F, ci).astype(np.float32))
        w1 = rng.randn(3, 3, ci, cm).astype(np.float32)
        w2 = rng.randn(3, 3, cm, co).astype(np.float32)
        ref = conv(conv(x, jnp.asarray(w1)), jnp.asarray(w2))
        got = self._chain(x, w1, w2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_with_nonlinearity(self, rng):
        # silu between the convs: the offset grid's two out-of-range
        # rows/cols must be re-zeroed after any bias/nonlinearity so the
        # VALID conv reads the plain SAME-padding zeros
        ci = cm = co = 4
        x = jnp.asarray(rng.randn(B, N, F, ci).astype(np.float32))
        w1 = rng.randn(3, 3, ci, cm).astype(np.float32)
        w2 = rng.randn(3, 3, cm, co).astype(np.float32)
        ref = conv(jax.nn.silu(conv(x, jnp.asarray(w1))), jnp.asarray(w2))
        got = self._chain(x, w1, w2, fn=jax.nn.silu)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_traced_kernels_match_host(self, rng):
        from sddm_tpu.ops.packed import (
            pack_kernel_s1_from_offset, pack_kernel_s1_to_offset,
            pack_kernel_traced)

        w = rng.randn(3, 3, 3, 5).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(pack_kernel_traced("s1to", jnp.asarray(w))),
            pack_kernel_s1_to_offset(w))
        np.testing.assert_array_equal(
            np.asarray(pack_kernel_traced("s1from", jnp.asarray(w))),
            pack_kernel_s1_from_offset(w))

    def test_flop_reduction(self):
        # the point of the offset form: 2x2 kernels at 9/16 density vs 3x3
        # at 1/4 -> nonzero MAC count identical, total MACs 2.25x fewer
        from sddm_tpu.ops.packed import pack_kernel_s1_to_offset

        w = np.random.RandomState(1).randn(3, 3, 4, 4).astype(np.float32)
        dense = pack_kernel_s1(w)
        off = pack_kernel_s1_to_offset(w)
        assert dense.size / off.size == 2.25
        assert np.count_nonzero(dense) == np.count_nonzero(off)

    def test_offset_gn_divisor(self, rng):
        # zero-masked offset tensor + true-count divisor == flax GroupNorm
        # on the equivalent standard tensor
        import flax.linen as nn

        from sddm_tpu.models.unet_packed import _GN, _packed_gn_plan
        from sddm_tpu.ops.packed import (
            offset_mask, pack_kernel_s1_to_offset)

        ci, c, groups = 3, 8, 4
        x = jnp.asarray(rng.randn(B, N, F, ci).astype(np.float32))
        w = rng.randn(3, 3, ci, c).astype(np.float32)
        ref_y = conv(x, jnp.asarray(w))
        mod = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
        ref = np.asarray(mod.apply(
            {"params": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}},
            ref_y))

        y = conv(s2d(x), jnp.asarray(pack_kernel_s1_to_offset(w)),
                 padding=((1, 1), (1, 1)))
        m = jnp.asarray(offset_mask(y.shape[1], y.shape[2], c))
        plan = _packed_gn_plan(groups, (c,))
        gn = _GN(jnp.ones((4 * c,)), jnp.zeros((4 * c,)), groups, plan,
                 offset=True)
        got = np.asarray(gn(y * m))
        # compare at the valid positions: unpack the offset grid
        b, ho, wo, _ = got.shape
        full = got.reshape(b, ho, wo, 2, 2, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, 2 * ho, 2 * wo, c)
        np.testing.assert_allclose(full[:, 1:-1, 1:-1], ref,
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow  # two full flagship-ish compiles (~75 s) — full tier only
class TestBf16NumericsParity:
    """Round-3 quality-forensics regression guard (PERFORMANCE.md): the
    packed engines' bf16 forward must not carry MORE rounding error than
    the plain bf16 forward — an extra bf16 cast per GN site (eps ~ 4e-3)
    measurably degraded 100-step sampler quality before the cast-reorder
    fix.  All other exactness suites run f32 and cannot see this."""

    def test_packed_bf16_error_matches_plain(self):
        from sddm_tpu.models import UNetModified2
        from sddm_tpu.models.unet_packed import PackedUNetModified2

        ns = 72

        def make(dtype):
            return UNetModified2(
                num_samples=ns, inner_channel=8, norm_groups=4,
                channel_mults=(1, 2), res_blocks=1, segment_len=16,
                segment_stride=8, dtype=dtype)

        net32, net16 = make(jnp.float32), make(jnp.bfloat16)
        rng = np.random.RandomState(0)
        cond = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 1, ns)).astype(np.float32))
        x_t = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 1, ns)).astype(np.float32))
        lvl = jnp.full((2, 1, 1), 0.7, jnp.float32)
        params = net32.init(jax.random.PRNGKey(0), cond, x_t, lvl)

        truth = np.asarray(net32.apply(params, cond, x_t, lvl), np.float64)
        plain = np.asarray(net16.apply(params, cond, x_t, lvl), np.float64)
        eng = PackedUNetModified2(net16)
        packed = np.asarray(
            eng.apply(eng.pack(params), cond, x_t, lvl), np.float64)

        e_plain = np.sqrt(((plain - truth) ** 2).mean())
        e_packed = np.sqrt(((packed - truth) ** 2).mean())
        # parity within reassociation noise; the pre-fix extra-cast bug
        # showed up as a ~15% systematic excess at flagship scale
        assert e_packed <= 1.3 * e_plain + 1e-6, (e_packed, e_plain)


class TestTapstackHead:
    """Tap-stacked head conv (models/unet_packed.py::_conv_tapstack): the
    lane-degenerate final conv re-expressed as one 9x-wider matmul + a
    shifted 9-term sum — must reproduce the SAME-padding conv elementwise."""

    @pytest.mark.parametrize("shape", [
        (3, 3, 128, 4),   # packed flagship head
        (3, 3, 32, 1),    # unpacked head
        (1, 1, 64, 4),
        (5, 3, 16, 2),
    ])
    def test_matches_conv(self, rng, shape):
        from sddm_tpu.models.unet_packed import _conv, _conv_tapstack
        kh, kw, ci, co = shape
        x = jnp.asarray(rng.randn(2, 9, 11, ci).astype(np.float32))
        w = jnp.asarray(rng.randn(kh, kw, ci, co).astype(np.float32))
        b = jnp.asarray(rng.randn(co).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(_conv_tapstack(x, w, b)),
            np.asarray(_conv(x, w, b)), rtol=2e-4, atol=5e-5)

    def test_bf16_single_rounding(self, rng):
        """bf16 serving dtype: the tap matmul + shifted sum accumulate in
        f32 with ONE final cast (advisor r3) — so tapstack stays within
        one bf16 ulp of _conv's single-rounding result instead of
        compounding 9 per-tap roundings."""
        from sddm_tpu.models.unet_packed import _conv, _conv_tapstack
        x = jnp.asarray(rng.randn(2, 9, 11, 128), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, 128, 4), jnp.bfloat16)
        b = jnp.asarray(rng.randn(4), jnp.bfloat16)
        got = np.asarray(_conv_tapstack(x, w, b), np.float32)
        want = np.asarray(_conv(x, w, b), np.float32)
        assert got.dtype == want.dtype
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=2 * 0.0079 * scale)

    @pytest.mark.slow  # compiles two full packed engines (~90 s CPU)
    def test_engine_exact_under_flag(self, rng, monkeypatch):
        """Full packed forward with SDDM_TAPSTACK_HEAD on == flag off."""
        from sddm_tpu.models import unet_packed
        from sddm_tpu.models.unet_packed import PackedUNetModified2
        from sddm_tpu.models.unet_modified2 import UNetModified2

        ns = 72  # 8 frames of 16 @ stride 8
        net = UNetModified2(num_samples=ns, inner_channel=8, norm_groups=4,
                            channel_mults=(1, 2, 3), res_blocks=1,
                            segment_len=16, segment_stride=8,
                            dtype=jnp.float32)
        rs = np.random.RandomState(1)
        cond = jnp.asarray(rs.uniform(-0.5, 0.5, (2, 1, ns)).astype(np.float32))
        x_t = jnp.asarray(rs.uniform(-0.5, 0.5, (2, 1, ns)).astype(np.float32))
        lvl = jnp.full((2, 1, 1), 0.7, jnp.float32)
        params = net.init(jax.random.PRNGKey(0), cond, x_t, lvl)
        eng = PackedUNetModified2(net)
        packed = eng.pack(params)

        monkeypatch.setattr(unet_packed, "_TAPSTACK_HEAD", False)
        ref = np.asarray(eng.apply(packed, cond, x_t, lvl))
        monkeypatch.setattr(unet_packed, "_TAPSTACK_HEAD", True)
        got = np.asarray(eng.apply(packed, cond, x_t, lvl))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
