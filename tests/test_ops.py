"""Unit tests: pure-JAX ops vs literal loop oracles (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganet_tpu.ops import (
    build_cost_volume,
    disparity_regression,
    l1_normalize,
    lga,
    lga3d,
    sga,
    sga_sweep,
    soft_argmin,
    trilinear_upsample,
)
from tests.oracles import cost_volume_oracle, lga_oracle, sga_oracle, sga_sweep_oracle


def _rand_weights(rng, shape):
    w = rng.standard_normal(shape).astype(np.float32)
    return np.asarray(l1_normalize(jnp.asarray(w), axis=-1))


class TestCostVolume:
    def test_matches_oracle(self, rng):
        left = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
        right = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
        got = np.asarray(build_cost_volume(jnp.asarray(left), jnp.asarray(right), 4))
        want = cost_volume_oracle(left, right, 4)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_single_disparity(self, rng):
        left = rng.standard_normal((1, 3, 4, 2)).astype(np.float32)
        right = rng.standard_normal((1, 3, 4, 2)).astype(np.float32)
        got = np.asarray(build_cost_volume(jnp.asarray(left), jnp.asarray(right), 1))
        assert got.shape == (1, 1, 3, 4, 4)
        np.testing.assert_allclose(got[:, 0, :, :, 2:], right, rtol=1e-6)


class TestSGA:
    @pytest.mark.parametrize("axis,reverse", [("w", False), ("w", True), ("h", False), ("h", True)])
    def test_sweep_matches_oracle(self, rng, axis, reverse):
        x = rng.standard_normal((1, 5, 4, 6, 2)).astype(np.float32)
        w = _rand_weights(rng, (1, 4, 6, 2, 5))
        got = np.asarray(sga_sweep(jnp.asarray(x), jnp.asarray(w), axis, reverse))
        want = sga_sweep_oracle(x, w, axis, reverse)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_full_sga_matches_oracle(self, rng):
        x = rng.standard_normal((2, 4, 3, 5, 2)).astype(np.float32)
        w = _rand_weights(rng, (2, 3, 5, 2, 4, 5))
        got = np.asarray(sga(jnp.asarray(x), jnp.asarray(w)))
        want = sga_oracle(x, w)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_uniform_weights_identity_first_column(self, rng):
        # With w = (1,0,0,0,0) every pixel keeps its own cost.
        x = rng.standard_normal((1, 3, 4, 4, 1)).astype(np.float32)
        w = np.zeros((1, 4, 4, 1, 5), dtype=np.float32)
        w[..., 0] = 1.0
        got = np.asarray(sga_sweep(jnp.asarray(x), jnp.asarray(w), "w", False))
        np.testing.assert_allclose(got, x, rtol=1e-6)

    def test_grads_flow(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 3, 4, 5, 2)).astype(np.float32))
        w = jnp.asarray(_rand_weights(rng, (1, 4, 5, 2, 4, 5)))

        def f(x, w):
            return jnp.sum(sga(x, w) ** 2)

        gx, gw = jax.grad(f, argnums=(0, 1))(x, w)
        assert np.isfinite(np.asarray(gx)).all()
        assert np.isfinite(np.asarray(gw)).all()
        assert float(jnp.abs(gw).sum()) > 0

    def test_gradcheck_vs_numerical(self, rng):
        from jax.test_util import check_grads

        x = jnp.asarray(rng.standard_normal((1, 3, 3, 4, 1)).astype(np.float64))
        w = jnp.asarray(
            _rand_weights(rng, (1, 3, 4, 1, 4, 5)).astype(np.float64)
        )
        check_grads(lambda a, b: sga(a, b), (x, w), order=1, modes=["rev"], atol=1e-3, rtol=1e-3)


class TestLGA:
    def test_matches_oracle(self, rng):
        x = rng.standard_normal((1, 4, 5, 6)).astype(np.float32)
        g = _rand_weights(rng, (1, 5, 6, 75))
        got = np.asarray(lga(jnp.asarray(x), jnp.asarray(g), radius=2))
        want = lga_oracle(x, g, radius=2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_radius1(self, rng):
        x = rng.standard_normal((1, 3, 4, 4)).astype(np.float32)
        g = _rand_weights(rng, (1, 4, 4, 27))
        got = np.asarray(lga(jnp.asarray(x), jnp.asarray(g), radius=1))
        want = lga_oracle(x, g, radius=1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_repeats_compose(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 3, 4, 4)).astype(np.float32))
        g = jnp.asarray(_rand_weights(rng, (1, 4, 4, 75)))
        once_twice = lga(lga(x, g), g)
        twice = lga(x, g, repeats=2)
        np.testing.assert_allclose(
            np.asarray(once_twice), np.asarray(twice), rtol=1e-5, atol=1e-6
        )

    def test_grads_flow(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 3, 4, 4)).astype(np.float32))
        g = jnp.asarray(_rand_weights(rng, (1, 4, 4, 75)))
        gx, gg = jax.grad(lambda a, b: jnp.sum(lga(a, b) ** 2), argnums=(0, 1))(x, g)
        assert np.isfinite(np.asarray(gx)).all()
        assert np.isfinite(np.asarray(gg)).all()


class TestLGA3D:
    def test_matches_per_channel_lga(self, rng):
        # lga3d == lga applied to each channel with the shared guidance
        # (reference Lga3dFunction semantics).
        x = rng.standard_normal((2, 3, 4, 5, 3)).astype(np.float32)
        g = _rand_weights(rng, (2, 4, 5, 75))
        got = np.asarray(lga3d(jnp.asarray(x), jnp.asarray(g), radius=2))
        for c in range(x.shape[-1]):
            want = np.asarray(lga(jnp.asarray(x[..., c]), jnp.asarray(g), radius=2))
            np.testing.assert_allclose(got[..., c], want, rtol=1e-5, atol=1e-6)

    def test_grads_flow(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 3, 4, 4, 2)).astype(np.float32))
        g = jnp.asarray(_rand_weights(rng, (1, 4, 4, 75)))
        gx, gg = jax.grad(
            lambda a, b: jnp.sum(lga3d(a, b) ** 2), argnums=(0, 1)
        )(x, g)
        assert np.isfinite(np.asarray(gx)).all()
        assert np.isfinite(np.asarray(gg)).all()
        assert float(jnp.abs(gg).sum()) > 0

    def test_dispatch_pallas_interpret_matches_scan(self, rng):
        from ganet_tpu.ops import dispatch

        x = rng.standard_normal((1, 3, 6, 7, 2)).astype(np.float32)
        g = _rand_weights(rng, (1, 6, 7, 75))
        want = np.asarray(lga3d(jnp.asarray(x), jnp.asarray(g)))
        got = np.asarray(
            dispatch.lga3d(jnp.asarray(x), jnp.asarray(g), impl="pallas")
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestDisparity:
    def test_regression_peaked(self):
        # Probability mass concentrated at bin 7 -> disparity ~7.
        D = 16
        prob = np.zeros((1, D, 2, 2), dtype=np.float32)
        prob[:, 7] = 1.0
        out = np.asarray(disparity_regression(jnp.asarray(prob), D))
        np.testing.assert_allclose(out, 7.0, atol=1e-6)

    def test_soft_argmin_prefers_low_cost(self, rng):
        D = 8
        cost = np.full((1, D, 3, 3), 10.0, dtype=np.float32)
        cost[:, 2] = 0.0  # lowest cost at d=2
        p = soft_argmin(jnp.asarray(cost))
        disp = np.asarray(disparity_regression(p, D))
        np.testing.assert_allclose(disp, 2.0, atol=1e-2)

    def test_trilinear_upsample_shape_and_values(self):
        x = jnp.arange(2 * 4 * 4, dtype=jnp.float32).reshape(1, 2, 4, 4)
        out = trilinear_upsample(x, (6, 12, 12))
        assert out.shape == (1, 6, 12, 12)
        # Linear resize preserves the overall mean approximately.
        np.testing.assert_allclose(
            float(out.mean()), float(x.mean()), rtol=0.05
        )

    def test_l1_normalize(self, rng):
        x = jnp.asarray(rng.standard_normal((3, 7)).astype(np.float32))
        n = l1_normalize(x, axis=-1)
        np.testing.assert_allclose(
            np.abs(np.asarray(n)).sum(-1), 1.0, rtol=1e-5
        )
