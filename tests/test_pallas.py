"""Pallas kernel correctness (interpret mode on CPU backend)."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sddm_tpu.experimental.pallas_groupnorm_swish import (
    group_norm_swish,
    group_norm_swish_reference,
)


class TestGroupNormSwish:
    @pytest.mark.parametrize("shape,groups", [
        ((2, 8, 16, 32), 4),
        ((1, 16, 16, 8), 8),
        ((3, 4, 8, 16), 2),
    ])
    def test_matches_reference(self, shape, groups):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, shape)
        c = shape[-1]
        scale = jax.random.uniform(jax.random.PRNGKey(1), (c,), minval=0.5,
                                   maxval=1.5)
        bias = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.1
        got = group_norm_swish(x, scale, bias, num_groups=groups,
                               interpret=True)
        ref = group_norm_swish_reference(x, scale, bias, num_groups=groups)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_matches_flax_groupnorm(self):
        """The fused kernel must agree with flax GroupNorm + silu, which is
        what blocks.Block uses."""
        from flax import linen as nn

        x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 16))
        gn = nn.GroupNorm(num_groups=4)
        params = gn.init(jax.random.PRNGKey(4), x)
        scale = params["params"]["scale"]
        bias = params["params"]["bias"]
        ref = jax.nn.silu(gn.apply(params, x))
        got = group_norm_swish(x, scale, bias, num_groups=4, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_bf16(self):
        x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 8),
                              dtype=jnp.bfloat16)
        scale = jnp.ones((8,))
        bias = jnp.zeros((8,))
        got = group_norm_swish(x, scale, bias, num_groups=2, interpret=True)
        ref = group_norm_swish_reference(x, scale, bias, num_groups=2)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2,
        )


class TestGnSilu:
    """experimental/pallas_gn_silu.py must match the packed engine's
    _GN + silu (+ offset mask) chain elementwise (it lost its on-chip A/B
    — see its docstring — but stays exactness-pinned)."""

    @pytest.mark.parametrize("H,W,c,groups,offset", [
        (9, 5, 8, 4, True),
        (17, 9, 16, 8, False),
        (13, 7, 8, 4, True),
    ])
    def test_matches_packed_gn(self, H, W, c, groups, offset):
        from sddm_tpu.experimental.pallas_gn_silu import gn_silu
        from sddm_tpu.models.unet_packed import (
            _GN,
            _offset_mask_np,
            _packed_gn_plan,
        )

        C4 = 4 * c
        plan = _packed_gn_plan(groups, (c,))
        key = jax.random.PRNGKey(H)
        x = jax.random.normal(key, (2, H, W, C4))
        if offset:
            x = x * jnp.asarray(_offset_mask_np(H, W, c), x.dtype)
        sc = jax.random.normal(jax.random.fold_in(key, 1), (C4,))
        bi = jax.random.normal(jax.random.fold_in(key, 2), (C4,))
        gn = _GN(sc, bi, groups, plan, offset=offset)
        want = jax.nn.silu(gn(x))
        if offset:
            want = want * jnp.asarray(_offset_mask_np(H, W, c), want.dtype)
        got = gn_silu(x, sc, bi, jnp.asarray(plan[2]), count=plan[3],
                      offset=offset, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
