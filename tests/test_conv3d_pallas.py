"""Parity tests for the fused Pallas 3x3x3 conv kernel (interpret mode on
CPU) against the XLA lowering it replaces (conv3d_via_2d, itself tested
against lax.conv in test_models.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganet_tpu.models.layers import conv3d_fused, conv3d_via_2d
from ganet_tpu.ops import conv3d_pallas as cp


SHAPES = [
    # (B, D, H, W, Cin), Cout — production-like ratios, test-sized.
    ((1, 6, 16, 24, 16), 8),
    ((2, 5, 16, 24, 16), 8),  # odd D, B>1
    ((1, 4, 24, 16, 8), 16),  # Th=8 with H=24, Cout>Cin
    ((1, 3, 8, 8, 4), 4),  # minimum depth for the rolling accumulator
]


class TestConv3dPallas:
    @pytest.mark.parametrize("variant", ["taps", "im2col"])
    @pytest.mark.parametrize("xshape,cout", SHAPES)
    def test_forward_parity(self, xshape, cout, variant):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(k1, xshape, jnp.float32)
        w = jax.random.normal(k2, (3, 3, 3, xshape[-1], cout), jnp.float32)
        y = cp.conv3d_pallas(x, w, variant=variant)
        ref = conv3d_via_2d(x, w, 1)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_supported_predicate(self):
        assert cp.supported((1, 64, 192, 320, 64), (3, 3, 3, 64, 32), 1)
        assert not cp.supported((1, 64, 192, 320, 64), (3, 3, 3, 64, 32), 2)
        assert not cp.supported((1, 64, 192, 320, 64), (2, 3, 3, 64, 32), 1)
        assert not cp.supported((1, 64, 192, 321, 64), (3, 3, 3, 64, 32), 1)
        assert not cp.supported((1, 1, 192, 320, 64), (3, 3, 3, 64, 32), 1)

    def test_fused_gradients_match_via2d(self):
        """conv3d_fused's custom VJP must equal autodiff of the oracle."""
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
        x = jax.random.normal(k1, (1, 4, 8, 16, 8), jnp.float32)
        w = jax.random.normal(k2, (3, 3, 3, 8, 8), jnp.float32)
        ct = jax.random.normal(k3, (1, 4, 8, 16, 8), jnp.float32)

        def loss_fused(x, w):
            return jnp.sum(conv3d_fused(x, w, jnp.float32) * ct)

        def loss_ref(x, w):
            return jnp.sum(conv3d_via_2d(x, w, 1) * ct)

        gx, gw = jax.grad(loss_fused, argnums=(0, 1))(x, w)
        rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-4, atol=1e-4)

    def test_bf16_io_f32_accumulation(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        x = jax.random.normal(k1, (1, 4, 8, 16, 8), jnp.bfloat16)
        w = jax.random.normal(k2, (3, 3, 3, 8, 8), jnp.bfloat16)
        y = cp.conv3d_pallas(x, w, out_dtype=jnp.bfloat16)
        assert y.dtype == jnp.bfloat16
        ref = conv3d_via_2d(
            x.astype(jnp.float32), w.astype(jnp.float32), 1
        )
        rel = np.abs(np.asarray(y, np.float32) - np.asarray(ref)) / (
            np.abs(np.asarray(ref)) + 1.0
        )
        assert rel.max() < 0.05
