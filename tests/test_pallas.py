"""Pallas SGA kernel vs the lax.scan oracle (SURVEY.md §4 "Kernel unit
tests").  On CPU the kernels run in interpreter mode; set GANET_TEST_TPU=1
to run compiled on the real chip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganet_tpu.ops import l1_normalize
from ganet_tpu.ops.sga import sga as _sga_scan, sga_sweep as _sga_sweep_scan
from ganet_tpu.ops import sga_pallas


def _rand_weights(rng, shape):
    w = rng.standard_normal(shape).astype(np.float32)
    return np.asarray(l1_normalize(jnp.asarray(w), axis=-1))


SHAPES = [
    # (B, D, H, W, C) — include non-multiples of the 128-lane tile and
    # L-block sizes to exercise partial blocks on both grid axes.
    (1, 4, 6, 10, 2),
    (2, 8, 5, 7, 1),
    (1, 16, 130, 9, 1),  # H > one lane tile
]


class TestSGAPallasForward:
    @pytest.mark.parametrize("shape", SHAPES)
    @pytest.mark.parametrize(
        "axis,reverse", [("w", False), ("w", True), ("h", False), ("h", True)]
    )
    def test_sweep_matches_scan(self, rng, shape, axis, reverse):
        B, D, H, W, C = shape
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        w = jnp.asarray(_rand_weights(rng, (B, H, W, C, 5)))
        got = sga_pallas.sga_sweep(x, w, axis, reverse)
        want = _sga_sweep_scan(x, w, axis, reverse)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_full_sga_matches_scan(self, rng):
        shape = (1, 6, 10, 12, 2)
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        w = jnp.asarray(_rand_weights(rng, (1, 10, 12, 2, 4, 5)))
        got = sga_pallas.sga(x, w)
        want = _sga_scan(x, w)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


class TestSGAPallasBackward:
    @pytest.mark.parametrize(
        "axis,reverse", [("w", False), ("w", True), ("h", False), ("h", True)]
    )
    def test_vjp_matches_scan(self, rng, axis, reverse):
        shape = (1, 5, 6, 9, 2)
        B, D, H, W, C = shape
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        w = jnp.asarray(_rand_weights(rng, (B, H, W, C, 5)))
        ct = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

        _, vjp_p = jax.vjp(lambda a, b: sga_pallas.sga_sweep(a, b, axis, reverse), x, w)
        _, vjp_s = jax.vjp(lambda a, b: _sga_sweep_scan(a, b, axis, reverse), x, w)
        dx_p, dw_p = vjp_p(ct)
        dx_s, dw_s = vjp_s(ct)
        np.testing.assert_allclose(
            np.asarray(dx_p), np.asarray(dx_s), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(dw_p), np.asarray(dw_s), rtol=1e-4, atol=1e-4
        )

    def test_vjp_partial_tail_block(self, rng):
        # L chosen so the canonical sweep has a partial tail L-block even
        # with the smallest block size (8): L = 11.
        shape = (1, 4, 11, 6, 1)
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        w = jnp.asarray(_rand_weights(rng, (1, 11, 6, 1, 5)))
        ct = jnp.ones(shape, jnp.float32)
        _, vjp_p = jax.vjp(lambda a, b: sga_pallas.sga_sweep(a, b, "h", False), x, w)
        _, vjp_s = jax.vjp(lambda a, b: _sga_sweep_scan(a, b, "h", False), x, w)
        for gp, gs in zip(vjp_p(ct), vjp_s(ct)):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gs), rtol=1e-4, atol=1e-4
            )

    def test_full_sga_grad_matches_scan(self, rng):
        shape = (1, 5, 8, 10, 1)
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        w = jnp.asarray(_rand_weights(rng, (1, 8, 10, 1, 4, 5)))

        gp = jax.grad(lambda a, b: jnp.sum(sga_pallas.sga(a, b) ** 2), argnums=(0, 1))(x, w)
        gs = jax.grad(lambda a, b: jnp.sum(_sga_scan(a, b) ** 2), argnums=(0, 1))(x, w)
        for a, b in zip(gp, gs):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )


class TestSGAPallasSeeded:
    """Seeded boundary condition — the wavefront pipeline's local sweep
    (parallel/sharded_sga.py consumes this inside shard_map)."""

    @pytest.mark.parametrize("reverse", [False, True])
    @pytest.mark.parametrize("valid", [True, False])
    def test_seeded_fwd_matches_scan(self, rng, reverse, valid):
        shape = (1, 4, 7, 6, 2)
        B, D, H, W, C = shape
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        w = jnp.asarray(_rand_weights(rng, (B, H, W, C, 5)))
        seed = jnp.asarray(rng.standard_normal((B, D, W, C)).astype(np.float32))
        vflag = jnp.asarray(valid)
        got = sga_pallas.sga_sweep(
            x, w, "h", reverse, initial=seed, initial_valid=vflag
        )
        want = _sga_sweep_scan(
            x, w, "h", reverse, initial=seed, initial_valid=vflag
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    @pytest.mark.parametrize("reverse", [False, True])
    @pytest.mark.parametrize("valid", [True, False])
    def test_seeded_vjp_matches_scan(self, rng, reverse, valid):
        """dx, dw AND dseed through the seeded kernel — dseed is what the
        pipeline ppermutes backward across shards."""
        shape = (1, 4, 6, 5, 1)
        B, D, H, W, C = shape
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        w = jnp.asarray(_rand_weights(rng, (B, H, W, C, 5)))
        seed = jnp.asarray(rng.standard_normal((B, D, W, C)).astype(np.float32))
        vflag = jnp.asarray(valid)
        ct = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

        _, vjp_p = jax.vjp(
            lambda a, b, s: sga_pallas.sga_sweep(
                a, b, "h", reverse, initial=s, initial_valid=vflag
            ),
            x, w, seed,
        )
        _, vjp_s = jax.vjp(
            lambda a, b, s: _sga_sweep_scan(
                a, b, "h", reverse, initial=s, initial_valid=vflag
            ),
            x, w, seed,
        )
        for gp, gs in zip(vjp_p(ct), vjp_s(ct)):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gs), rtol=1e-4, atol=1e-4
            )

    def test_seeded_partial_tail_block(self, rng):
        shape = (1, 4, 11, 6, 1)  # L=11: partial tail L-block
        B, D, H, W, C = shape
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        w = jnp.asarray(_rand_weights(rng, (B, H, W, C, 5)))
        seed = jnp.asarray(rng.standard_normal((B, D, W, C)).astype(np.float32))
        vflag = jnp.asarray(True)
        got = sga_pallas.sga_sweep(
            x, w, "h", True, initial=seed, initial_valid=vflag
        )
        want = _sga_sweep_scan(
            x, w, "h", True, initial=seed, initial_valid=vflag
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )
