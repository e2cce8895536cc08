"""Local Guided Aggregation — Pallas TPU kernels.

TPU-native replacement for the reference's lga_cuda_forward/backward
(libGANet/src/GANet_kernel.cu, SURVEY.md §2 #2).  See ops/lga.py for the
semantics (that scan formulation is the tested oracle for this kernel).

Why a kernel: LGA is a spatially-varying 3x(KxK) stencil over a
(B, D, H, W) volume.  The pure-XLA scan formulation re-reads the whole
padded volume once per window offset (75x volume traffic at full
resolution); this kernel reads each input element ~3x (the three
disparity-shifted windows) and the guidance once.

Kernel geometry:
  grid (B, H-tiles, W-tiles, D) with D innermost:
    * the guidance block (1, 75, Ht, Wt) has a d-independent index map, so
      Pallas keeps it resident across the whole D loop (one fetch per
      spatial tile);
    * the x window (3, Ht+2r, Wt+2r) — disparity slices d-1, d, d+1 with
      spatial halo — is DMA'd manually from the padded volume in ANY
      memory space (BlockSpecs cannot express halos);
    * the output block (1, 1, Ht, Wt) is written per (d, tile).
  The 3*K*K multiply-accumulates are fully unrolled static slices of the
  VMEM window — pure VPU code.

Backward (custom VJP): one kernel produces both
    dx(p,d) = sum_off [ g0(p-off,off)*gbar(p-off,d)
                      + g1(p-off,off)*gbar(p-off,d+1)
                      + g2(p-off,off)*gbar(p-off,d-1) ]
  (the transposed stencil — windows of gbar AND of the guidance) and
    dg(p,k,off) = sum_d gbar(p,d) * x(p+off, d+delta_k)
  accumulated across the innermost D grid dimension into a d-independent
  output block.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _pick_tiles(H: int, W: int) -> Tuple[int, int]:
    Ht = min(H, 32)
    Wt = min(W, 256)
    return Ht, Wt


def _pad_to_multiple(x, mults, axes):
    pads = [(0, 0)] * x.ndim
    for ax, m in zip(axes, mults):
        rem = (-x.shape[ax]) % m
        pads[ax] = (0, rem)
    return jnp.pad(x, pads) if any(p != (0, 0) for p in pads) else x


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _make_fwd_kernel(K: int, Ht: int, Wt: int):
    r = (K - 1) // 2

    def kernel(xp_ref, g_ref, o_ref, xwin, sem):
        b = pl.program_id(0)
        h = pl.program_id(1)
        w = pl.program_id(2)
        d = pl.program_id(3)
        dma = pltpu.make_async_copy(
            xp_ref.at[
                b,
                pl.ds(d, 3),
                pl.ds(h * Ht, Ht + 2 * r),
                pl.ds(w * Wt, Wt + 2 * r),
            ],
            xwin,
            sem,
        )
        dma.start()
        dma.wait()
        acc = jnp.zeros((Ht, Wt), jnp.float32)
        # filter k: 0 -> same d (xwin[1]), 1 -> d-1 (xwin[0]), 2 -> d+1
        # (xwin[2]); guidance channel layout (k, dy, dx) row-major.
        for k, xslice in ((0, 1), (1, 0), (2, 2)):
            xs = xwin[xslice].astype(jnp.float32)
            for iy in range(K):
                for ix in range(K):
                    gch = g_ref[0, k * K * K + iy * K + ix].astype(jnp.float32)
                    acc = acc + gch * xs[iy : iy + Ht, ix : ix + Wt]
        o_ref[0, 0] = acc.astype(o_ref.dtype)

    return kernel


def _lga_once(x: jnp.ndarray, g75: jnp.ndarray, radius: int) -> jnp.ndarray:
    """x (B, D, H, W), g75 (B, 75, H, W) pre-normalized -> (B, D, H, W)."""
    B, D, H, W = x.shape
    K = 2 * radius + 1
    Ht, Wt = _pick_tiles(H, W)
    Hp = H + (-H) % Ht
    Wp = W + (-W) % Wt
    # Pad: disparity by 1 both sides, spatial by r plus tile round-up.
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (1, 1),
            (radius, radius + (Hp - H)),
            (radius, radius + (Wp - W)),
        ),
    )
    gp = _pad_to_multiple(g75, (Ht, Wt), (2, 3))

    grid = (B, Hp // Ht, Wp // Wt, D)
    out = pl.pallas_call(
        _make_fwd_kernel(K, Ht, Wt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xp: manual DMA
            pl.BlockSpec(
                (1, 3 * K * K, Ht, Wt),
                lambda b, h, w, d: (b, 0, h, w),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, Ht, Wt),
            lambda b, h, w, d: (b, d, h, w),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, Hp, Wp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, Ht + 2 * radius, Wt + 2 * radius), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(xp, gp)
    return out[:, :, :H, :W]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _make_bwd_kernel(K: int, Ht: int, Wt: int, nd: int):
    r = (K - 1) // 2

    def kernel(
        xp_ref, gbp_ref, gwp_ref, gb_ref, dx_ref, dg_ref, xwin, bwin, gwin, sems
    ):
        """Inputs:
          xp_ref  (B, D+2, Hp+2r, Wp+2r) padded x          [ANY, DMA]
          gbp_ref (B, D+2, Hp+2r, Wp+2r) padded gbar       [ANY, DMA]
          gwp_ref (B, 75, Hp+2r, Wp+2r) padded guidance    [ANY, DMA]
          gb_ref  (1, 1, Ht, Wt) gbar tile                 [VMEM]
        Outputs:
          dx_ref  (1, 1, Ht, Wt)
          dg_ref  (1, 75, Ht, Wt) accumulated over the D grid dim
        """
        b = pl.program_id(0)
        h = pl.program_id(1)
        w = pl.program_id(2)
        d = pl.program_id(3)

        cp1 = pltpu.make_async_copy(
            xp_ref.at[
                b, pl.ds(d, 3), pl.ds(h * Ht, Ht + 2 * r), pl.ds(w * Wt, Wt + 2 * r)
            ],
            xwin,
            sems.at[0],
        )
        cp2 = pltpu.make_async_copy(
            gbp_ref.at[
                b, pl.ds(d, 3), pl.ds(h * Ht, Ht + 2 * r), pl.ds(w * Wt, Wt + 2 * r)
            ],
            bwin,
            sems.at[1],
        )
        cp1.start()
        cp2.start()

        # The guidance window is d-independent: fetch once per spatial tile
        # (D is the innermost grid dim, so scratch persists across it).
        @pl.when(d == 0)
        def _():
            cp3 = pltpu.make_async_copy(
                gwp_ref.at[
                    b, :, pl.ds(h * Ht, Ht + 2 * r), pl.ds(w * Wt, Wt + 2 * r)
                ],
                gwin,
                sems.at[2],
            )
            cp3.start()
            cp3.wait()

        cp1.wait()
        cp2.wait()

        f32 = jnp.float32
        # dx: transposed stencil.  bwin slices: [0]=gbar(d-1), [1]=gbar(d),
        # [2]=gbar(d+1).  Contribution of filter k at offset `off` to
        # dx(p, d) comes from gbar(p-off, d+delta) with delta: k0->0,
        # k1->+1, k2->-1.
        acc_dx = jnp.zeros((Ht, Wt), f32)
        for k, bslice in ((0, 1), (1, 2), (2, 0)):
            bw = bwin[bslice].astype(f32)
            for iy in range(K):
                for ix in range(K):
                    # p-off with off=(iy-r, ix-r): window start (r-(iy-r))
                    jy = 2 * r - iy
                    jx = 2 * r - ix
                    gch = gwin[k * K * K + iy * K + ix].astype(f32)
                    acc_dx = acc_dx + (
                        gch[jy : jy + Ht, jx : jx + Wt]
                        * bw[jy : jy + Ht, jx : jx + Wt]
                    )
        dx_ref[0, 0] = acc_dx.astype(dx_ref.dtype)

        # dg: gbar(p, d) * x(p+off, d+delta_k), accumulated over d.
        gb = gb_ref[0, 0].astype(f32)

        @pl.when(d == 0)
        def _():
            dg_ref[...] = jnp.zeros_like(dg_ref)

        for k, xslice in ((0, 1), (1, 0), (2, 2)):
            xs = xwin[xslice].astype(f32)
            for iy in range(K):
                for ix in range(K):
                    ch = k * K * K + iy * K + ix
                    contrib = gb * xs[iy : iy + Ht, ix : ix + Wt]
                    dg_ref[0, ch] = (
                        dg_ref[0, ch].astype(f32) + contrib
                    ).astype(dg_ref.dtype)

    return kernel


def _lga_bwd_once(
    x: jnp.ndarray, g75: jnp.ndarray, gbar: jnp.ndarray, radius: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B, D, H, W = x.shape
    K = 2 * radius + 1
    Ht, Wt = _pick_tiles(H, W)
    Hp = H + (-H) % Ht
    Wp = W + (-W) % Wt
    spad = lambda a: jnp.pad(
        a,
        (
            (0, 0),
            (1, 1),
            (radius, radius + (Hp - H)),
            (radius, radius + (Wp - W)),
        ),
    )
    xp = spad(x)
    gbp = spad(gbar)
    gwp = jnp.pad(
        g75,
        (
            (0, 0),
            (0, 0),
            (radius, radius + (Hp - H)),
            (radius, radius + (Wp - W)),
        ),
    )
    gb_tiles = _pad_to_multiple(gbar, (Ht, Wt), (2, 3))

    grid = (B, Hp // Ht, Wp // Wt, D)
    dx, dg = pl.pallas_call(
        _make_bwd_kernel(K, Ht, Wt, D),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 1, Ht, Wt),
                lambda b, h, w, d: (b, d, h, w),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, Ht, Wt),
                lambda b, h, w, d: (b, d, h, w),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3 * K * K, Ht, Wt),
                lambda b, h, w, d: (b, 0, h, w),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, D, Hp, Wp), x.dtype),
            jax.ShapeDtypeStruct((B, 3 * K * K, Hp, Wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((3, Ht + 2 * radius, Wt + 2 * radius), x.dtype),
            pltpu.VMEM((3, Ht + 2 * radius, Wt + 2 * radius), gbar.dtype),
            pltpu.VMEM((3 * K * K, Ht + 2 * radius, Wt + 2 * radius), g75.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=_interpret(),
    )(xp, gbp, gwp, gb_tiles)
    return dx[:, :, :H, :W], dg[:, :, :H, :W]


# ---------------------------------------------------------------------------
# public API (matches ops.lga.lga contract: g channels-last)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _lga_single(x, g75, radius):
    return _lga_once(x, g75, radius)


def _lga_single_fwd(x, g75, radius):
    out = _lga_once(x, g75, radius)
    return out, (x, g75)


def _lga_single_bwd(radius, res, gbar):
    x, g75 = res
    dx, dg = _lga_bwd_once(x, g75, gbar, radius)
    return dx, dg.astype(g75.dtype)


_lga_single.defvjp(_lga_single_fwd, _lga_single_bwd)


def lga(
    x: jnp.ndarray, g: jnp.ndarray, radius: int = 2, repeats: int = 1
) -> jnp.ndarray:
    """Pallas LGA; same contract as ops.lga.lga (g is (B, H, W, 3*K*K),
    normalized by the caller)."""
    K = 2 * radius + 1
    if g.shape[-1] != 3 * K * K:
        raise ValueError(f"guidance must have {3 * K * K} channels, got {g.shape}")
    g75 = jnp.transpose(g, (0, 3, 1, 2))  # channels-first for lane tiling
    for _ in range(repeats):
        x = _lga_single(x, g75, radius)
    return x
