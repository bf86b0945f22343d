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
