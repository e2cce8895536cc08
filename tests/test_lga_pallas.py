"""Pallas LGA kernel vs the scan oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganet_tpu.ops import l1_normalize
from ganet_tpu.ops.lga import lga as lga_scan
from ganet_tpu.ops import lga_pallas


def _rand(rng, shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def _weights(rng, B, H, W, K):
    g = _rand(rng, (B, H, W, 3 * K * K))
    return l1_normalize(g, axis=-1)


class TestLGAPallasForward:
    @pytest.mark.parametrize(
        "shape",
        [
            (1, 4, 8, 16),
            (2, 3, 7, 9),     # non-multiples of tiles
            (1, 6, 33, 40),   # crosses the 32-row tile
        ],
    )
    def test_matches_scan(self, rng, shape):
        B, D, H, W = shape
        x = _rand(rng, shape)
        g = _weights(rng, B, H, W, 5)
        got = np.asarray(lga_pallas.lga(x, g, radius=2))
        want = np.asarray(lga_scan(x, g, radius=2))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_radius1(self, rng):
        B, D, H, W = 1, 3, 6, 10
        x = _rand(rng, (B, D, H, W))
        g = _weights(rng, B, H, W, 3)
        got = np.asarray(lga_pallas.lga(x, g, radius=1))
        want = np.asarray(lga_scan(x, g, radius=1))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_repeats(self, rng):
        B, D, H, W = 1, 3, 8, 8
        x = _rand(rng, (B, D, H, W))
        g = _weights(rng, B, H, W, 5)
        got = np.asarray(lga_pallas.lga(x, g, repeats=2))
        want = np.asarray(lga_scan(x, g, repeats=2))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestLGAPallasBackward:
    def test_vjp_matches_scan(self, rng):
        B, D, H, W = 1, 4, 9, 11
        x = _rand(rng, (B, D, H, W))
        g = _weights(rng, B, H, W, 5)
        ct = _rand(rng, (B, D, H, W))
        _, vjp_p = jax.vjp(lambda a, b: lga_pallas.lga(a, b), x, g)
        _, vjp_s = jax.vjp(lambda a, b: lga_scan(a, b), x, g)
        for gp, gs in zip(vjp_p(ct), vjp_s(ct)):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gs), rtol=1e-4, atol=1e-4
            )

    def test_vjp_repeats2(self, rng):
        B, D, H, W = 1, 3, 8, 8
        x = _rand(rng, (B, D, H, W))
        g = _weights(rng, B, H, W, 5)

        gp = jax.grad(
            lambda a, b: jnp.sum(lga_pallas.lga(a, b, repeats=2) ** 2),
            argnums=(0, 1),
        )(x, g)
        gs = jax.grad(
            lambda a, b: jnp.sum(lga_scan(a, b, repeats=2) ** 2),
            argnums=(0, 1),
        )(x, g)
        for a, b in zip(gp, gs):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )


class TestLGAPallasFuzz:
    """Randomized odd-shape fuzzing of the manual-DMA kernel (VERDICT
    round-1 'race detection / sanitizers' row): interpreter mode checks
    every window DMA and slice for out-of-bounds at shapes that stress the
    D-chunk, H-tile and lane-roll padding edges simultaneously."""

    def test_fuzz_odd_shapes(self, rng):
        for i in range(12):
            B = int(rng.integers(1, 3))
            D = int(rng.integers(1, 12))
            H = int(rng.integers(1, 40))
            W = int(rng.integers(1, 50))
            x = _rand(rng, (B, D, H, W))
            g = _weights(rng, B, H, W, 5)
            got = np.asarray(lga_pallas.lga(x, g, radius=2))
            want = np.asarray(lga_scan(x, g, radius=2))
            np.testing.assert_allclose(
                got, want, rtol=1e-5, atol=1e-5,
                err_msg=f"shape {(B, D, H, W)} (case {i})",
            )

    def test_fuzz_vjp_odd_shape(self, rng):
        B, D, H, W = 1, 5, 11, 13
        x = _rand(rng, (B, D, H, W))
        g = _weights(rng, B, H, W, 5)
        ct = _rand(rng, (B, D, H, W))
        _, vjp_p = jax.vjp(lambda a, b: lga_pallas.lga(a, b, radius=2), x, g)
        _, vjp_s = jax.vjp(lambda a, b: lga_scan(a, b, radius=2), x, g)
        for gp, gs in zip(vjp_p(ct), vjp_s(ct)):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gs), rtol=1e-4, atol=1e-4
            )


class TestTileSelection:
    def test_crash_config_never_selected(self):
        """(Ht=32, Dt=16) crashes the Mosaic TPU compiler at Wk=640 f32
        (240x528 training crop, isolated round 3) — the selector must never
        produce it, at any width/dtype."""
        from ganet_tpu.ops.lga_pallas import _select_tiles

        for W in range(64, 1400, 16):
            for xi, gi in ((4, 4), (2, 2), (2, 4)):
                ht, dt, _ = _select_tiles(W, 5, xi, gi)
                assert (ht, dt) != (32, 16), (W, xi, gi)

    def test_known_shapes(self):
        """Pin the production configs: 240x528 f32 -> (32, 8) (the fixed
        crash shape), 576x960 f32 -> (16, 16) (round-2 measured config,
        unchanged by the fix)."""
        from ganet_tpu.ops.lga_pallas import _select_tiles

        assert _select_tiles(528, 5, 4, 4)[:2] == (32, 8)
        assert _select_tiles(960, 5, 4, 4)[:2] == (16, 16)


class TestUnrollCap:
    """_select_tiles must never emit a configuration at or above the
    Mosaic unroll cap — two independent on-chip crash points sit exactly
    at Dt*Ht*Wk = 327680: (32,16) at Wk=640 f32 (round 3) and (32,8) at
    Wk=1280 bf16, i.e. the 384x1248 KITTI frame with bf16 heads
    (round 5).  Chip-only crash, so the guard is pinned here as a pure
    function test.  (Distinct from TestTileSelection above, which pins
    the known-crash config and production tile choices.)"""

    def test_unroll_cap_respected(self):
        from ganet_tpu.ops.lga_pallas import _UNROLL_CAP, _select_tiles

        for W in (528, 960, 1248, 1280, 2048):
            for isize in (2, 4):
                Ht, Dt, Wk = _select_tiles(W, 5, isize, isize)
                assert Dt * Ht * Wk < _UNROLL_CAP, (W, isize, Ht, Dt, Wk)

    def test_kitti_frame_bf16_picks_safe_tile(self):
        from ganet_tpu.ops.lga_pallas import _select_tiles

        # bf16 at the KITTI frame: the old selection picked (32, 8) at
        # Wk=1280 (= the crash product); must now fall back.
        Ht, Dt, Wk = _select_tiles(1248, 5, 2, 2)
        assert Wk == 1280
        assert (Ht, Dt) != (32, 8)
