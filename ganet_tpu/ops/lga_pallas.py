"""Local Guided Aggregation — Pallas TPU kernels.

TPU-native replacement for the reference's lga_cuda_forward/backward
(libGANet/src/GANet_kernel.cu, SURVEY.md §2 #2).  See ops/lga.py for the
semantics (that scan formulation is the tested oracle for this kernel).

Why a kernel: LGA is a spatially-varying 3x(KxK) stencil over a
(B, D, H, W) volume.  The pure-XLA scan formulation re-reads the whole
padded volume once per window offset (75x volume traffic at full
resolution); this kernel reads each input element a handful of times (the
three disparity-shifted, halo-overlapping windows) and the guidance once.

Kernel geometry:
  grid (B, H-tiles, W-tiles, D) with D innermost:
    * the guidance block (1, 75, Ht, Wt) has a d-independent index map, so
      Pallas keeps it resident across the whole D loop (one fetch per
      spatial tile);
    * the x window — disparity slices d-1, d, d+1 with spatial halo — is
      DMA'd manually from the padded volume (BlockSpecs cannot express
      halos).  TPU DMA slices must be tile-aligned in the last two dims,
      so windows over-fetch to (Ht + 2*HALO_H, Wt + 2*HALO_W) with
      HALO_H = 8 (sublane tile) and HALO_W = 128 (lane tile), and the
      stencil reads at static sub-tile offsets inside VMEM;
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

_HALO_H = 8    # sublane tile
_HALO_W = 128  # lane tile
_LANES_W = 128  # lane-tile width (v2 pads full rows to this multiple)
# Mosaic unroll limit for the v2 forward kernel: Dt*Ht*Wk at or above this
# product crashes the TPU compiler (see _select_tiles docstring).
_UNROLL_CAP = 327680


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tiles(H: int, W: int, max_wt: int) -> Tuple[int, int]:
    Ht = 32
    Wt = min(_round_up(W, _HALO_W), max_wt)
    return Ht, Wt


def _pad_vol(x, Hp, Wp):
    """(B, D, H, W) -> (B, D+2, Hp+2*HALO_H, Wp+2*HALO_W); zero-padded with
    the image origin at (HALO_H, HALO_W)."""
    B, D, H, W = x.shape
    return jnp.pad(
        x,
        (
            (0, 0),
            (1, 1),
            (_HALO_H, _HALO_H + (Hp - H)),
            (_HALO_W, _HALO_W + (Wp - W)),
        ),
    )


def _pad_plane(g, Hp, Wp):
    """(B, C, H, W) -> (B, C, Hp+2*HALO_H, Wp+2*HALO_W)."""
    B, C, H, W = g.shape
    return jnp.pad(
        g,
        (
            (0, 0),
            (0, 0),
            (_HALO_H, _HALO_H + (Hp - H)),
            (_HALO_W, _HALO_W + (Wp - W)),
        ),
    )


def _pad_tiles(a, Ht, Wt):
    """Pad trailing spatial dims up to tile multiples (for VMEM blocks)."""
    pads = [(0, 0)] * a.ndim
    pads[-2] = (0, (-a.shape[-2]) % Ht)
    pads[-1] = (0, (-a.shape[-1]) % Wt)
    return jnp.pad(a, pads)


# ---------------------------------------------------------------------------
# forward (v2: full-width rows, lane rolls for W shifts, Dt-blocked D)
# ---------------------------------------------------------------------------
#
# v1 (kept for the backward pass below) tiled W at 512 with a 128-lane halo
# on both sides, so every one of the 75 stencil taps was a lane-misaligned
# VMEM slice — measured 20.6 ms per full-res pass (~6x its VPU/HBM bound).
# v2 processes FULL padded-W rows (the W pad is >= r zeros on each side),
# turning the five W offsets into five whole-row lane rolls shared across
# the five H offsets (sublane slices, cheap) and across a Dt-block of
# disparities; the per-(b, h)-tile guidance stays resident across the whole
# D loop.  HBM traffic ~1.1x the volume, vector work ~75 FMA + ~4 roll
# ops per element.


def _make_fwd_kernel_v2(K: int, Dt: int, Ht: int, Wk: int, nD: int):
    r = (K - 1) // 2
    wh = Ht + 2 * _HALO_H

    def kernel(xp_ref, gp_ref, o_ref, xwin, gwin, sems):
        """xp (B, Dp+2, Hp+16, Wk) HBM; gp (B, 75, Hp, Wk) HBM;
        o (1, Dt, Ht, Wk) VMEM block; xwin (2, Dt+2, wh, Wk) double-buffered
        window; gwin (75, Ht, Wk) guidance resident across the D grid."""
        b = pl.program_id(0)
        h = pl.program_id(1)
        dc = pl.program_id(2)

        def fetch(slot, chunk):
            return pltpu.make_async_copy(
                xp_ref.at[b, pl.ds(chunk * Dt, Dt + 2), pl.ds(h * Ht, wh), :],
                xwin.at[slot],
                sems.at[slot],
            )

        @pl.when(dc == 0)
        def _():
            fetch(0, 0).start()
            gcp = pltpu.make_async_copy(
                gp_ref.at[b, :, pl.ds(h * Ht, Ht), :], gwin, sems.at[2]
            )
            gcp.start()
            gcp.wait()

        fetch(dc % 2, dc).wait()

        @pl.when(dc + 1 < nD)
        def _():
            fetch((dc + 1) % 2, dc + 1).start()

        buf = xwin[dc % 2]  # (Dt+2, wh, Wk)
        f32 = jnp.float32
        for dl in range(Dt):
            acc = jnp.zeros((Ht, Wk), f32)
            # filter k: 0 -> same d (padded slice dl+1), 1 -> d-1 (dl),
            # 2 -> d+1 (dl+2); guidance channels (k, dy, dx) row-major.
            for k, off in ((0, 1), (1, 0), (2, 2)):
                sl = buf[dl + off].astype(f32)  # (wh, Wk)
                for ix in range(K):
                    s = ix - r  # out(w) consumes x(w + s)
                    rolled = sl if s == 0 else pltpu.roll(sl, (-s) % Wk, 1)
                    for iy in range(K):
                        oy = _HALO_H + iy - r
                        gch = gwin[k * K * K + iy * K + ix].astype(f32)
                        acc = acc + gch * rolled[oy : oy + Ht, :]
            o_ref[0, dl] = acc.astype(o_ref.dtype)

    return kernel


def _select_tiles(W: int, K: int, x_isize: int, g_isize: int):
    """(Ht, Dt, Wk) of the v2 forward kernel under the VMEM budget.

    Tile sizing under the 16 MB VMEM budget (wider images scale the
    full-width rows linearly — a fixed Ht/Dt OOMed at W=1248):
    double-buffered window 2*(Dt+2)*(Ht+16)*Wk + resident guidance
    75*Ht*Wk + double-buffered out 2*Dt*Ht*Wk.  Prefer big Ht (halo
    amortization) then big Dt (D-halo amortization); measured neutral
    between (16, 8) and (16, 16) at W=960 f32 — the kernel is VPU-bound,
    so shrinking tiles on wide images costs little.

    Besides VMEM, tiles are capped by a Mosaic UNROLL limit: the kernel
    body is a Dt x 75-tap x (Ht, Wk)-row unroll, and configurations with
    Dt*Ht*Wk >= 327680 crash the Mosaic compiler (remote compile-helper
    subprocess abort).  Two independent crash points sit exactly at that
    product — (32, 16) at Wk=640 f32, isolated round 3, and (32, 8) at
    Wk=1280 bf16 (the 384x1248 KITTI frame), isolated round 5 — while
    (32, 8) at Wk=1152 (= 294912) compiles everywhere.  _UNROLL_CAP
    rejects such tiles up front; the smaller fallbacks are measured
    performance-neutral (the kernel is VPU-bound), so nothing is lost.
    """
    r = (K - 1) // 2
    Wk = _round_up(W + 2 * r, _LANES_W)
    budget = 13 * 1024 * 1024
    Ht, Dt = 8, 2
    for ht, dt in ((32, 8), (16, 16), (16, 8), (8, 8), (8, 4)):
        win = 2 * (dt + 2) * (ht + 2 * _HALO_H) * Wk * x_isize
        gbuf = 3 * K * K * ht * Wk * g_isize
        outbuf = 2 * dt * ht * Wk * x_isize
        if dt * ht * Wk >= _UNROLL_CAP:
            continue
        if win + gbuf + outbuf <= budget:
            Ht, Dt = ht, dt
            break
    return Ht, Dt, Wk


def _lga_once(x: jnp.ndarray, g75: jnp.ndarray, radius: int) -> jnp.ndarray:
    """x (B, D, H, W), g75 (B, 75, H, W) pre-normalized -> (B, D, H, W)."""
    B, D, H, W = x.shape
    K = 2 * radius + 1
    r = radius
    Ht, Dt, Wk = _select_tiles(
        W, K, jnp.dtype(x.dtype).itemsize, jnp.dtype(g75.dtype).itemsize
    )
    Hp = _round_up(H, Ht)
    Dp = _round_up(D, Dt)
    nD = Dp // Dt
    # W data sits at lane offset r with >= r zeros on BOTH sides, so the
    # whole-row lane rolls wrap zeros into the active region, matching the
    # oracle's zero boundary.
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (1, Dp - D + 1),
            (_HALO_H, Hp - H + _HALO_H),
            (r, Wk - W - r),
        ),
    )
    gp = jnp.pad(g75, ((0, 0), (0, 0), (0, Hp - H), (r, Wk - W - r)))

    grid = (B, Hp // Ht, nD)
    out = pl.pallas_call(
        _make_fwd_kernel_v2(K, Dt, Ht, Wk, nD),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # xp: manual window DMA
            pl.BlockSpec(memory_space=pltpu.ANY),  # gp: manual, d-resident
        ],
        out_specs=pl.BlockSpec(
            (1, Dt, Ht, Wk),
            lambda b, h, d: (b, d, h, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Dp, Hp, Wk), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, Dt + 2, Ht + 2 * _HALO_H, Wk), x.dtype),
            pltpu.VMEM((3 * K * K, Ht, Wk), g75.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=_interpret(),
    )(xp, gp)
    return out[:, :D, :H, r : r + W]


# ---------------------------------------------------------------------------
# forward (v1 geometry — retained for reference/backward symmetry)
# ---------------------------------------------------------------------------


def _make_fwd_kernel(K: int, Ht: int, Wt: int, D: int):
    r = (K - 1) // 2
    wh = Ht + 2 * _HALO_H
    ww = Wt + 2 * _HALO_W

    def kernel(xp_ref, g_ref, o_ref, xwin, sems):
        """xwin: (4, wh, ww) rotating buffer of padded-D slices; step d uses
        padded slices d, d+1, d+2 (slots mod 4) while slice d+3 prefetches
        into the free slot — one slice of DMA per step instead of a full
        3-slice window (3x read traffic), overlapped with compute.  The D
        grid dim is innermost, so the buffer persists across d."""
        b = pl.program_id(0)
        h = pl.program_id(1)
        w = pl.program_id(2)
        d = pl.program_id(3)

        def fetch(idx):
            return pltpu.make_async_copy(
                xp_ref.at[b, idx, pl.ds(h * Ht, wh), pl.ds(w * Wt, ww)],
                xwin.at[idx % 4],
                sems.at[idx % 4],
            )

        @pl.when(d == 0)
        def _():
            for i in range(min(3, D + 2)):
                fetch(i).start()

        # Wait for this step's newest slice (started at d==0 or prefetched
        # at step d-1), then prefetch d+3 for the next step.
        fetch(d + 2).wait()

        @pl.when(d + 3 <= D + 1)
        def _():
            fetch(d + 3).start()

        @pl.when(d == 0)
        def _():
            fetch(0).wait()
            fetch(1).wait()

        acc = jnp.zeros((Ht, Wt), jnp.float32)
        # filter k: 0 -> same d (padded slice d+1), 1 -> d-1 (slice d),
        # 2 -> d+1 (slice d+2); guidance channels (k, dy, dx) row-major.
        for k, off in ((0, 1), (1, 0), (2, 2)):
            xs = xwin[(d + off) % 4].astype(jnp.float32)
            for iy in range(K):
                oy = _HALO_H + iy - r
                for ix in range(K):
                    ox = _HALO_W + ix - r
                    gch = g_ref[0, k * K * K + iy * K + ix].astype(jnp.float32)
                    acc = acc + gch * xs[oy : oy + Ht, ox : ox + Wt]
        o_ref[0, 0] = acc.astype(o_ref.dtype)

    return kernel


def _lga_once_v1(x: jnp.ndarray, g75: jnp.ndarray, radius: int) -> jnp.ndarray:
    """v1 forward (halo-window tiles) — superseded by _lga_once; kept as a
    cross-check surface for the kernel tests."""
    B, D, H, W = x.shape
    K = 2 * radius + 1
    Ht, Wt = _pick_tiles(H, W, max_wt=512)
    Hp = _round_up(H, Ht)
    Wp = _round_up(W, Wt)
    xp = _pad_vol(x, Hp, Wp)
    gp = _pad_tiles(g75, Ht, Wt)

    grid = (B, Hp // Ht, Wp // Wt, D)
    out = pl.pallas_call(
        _make_fwd_kernel(K, Ht, Wt, D),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # xp: manual halo DMA
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
            pltpu.VMEM((4, Ht + 2 * _HALO_H, Wt + 2 * _HALO_W), x.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=_interpret(),
    )(xp, gp)
    return out[:, :, :H, :W]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _make_bwd_kernel(K: int, Ht: int, Wt: int, D: int):
    r = (K - 1) // 2
    wh = Ht + 2 * _HALO_H
    ww = Wt + 2 * _HALO_W

    def kernel(
        xp_ref, gbp_ref, gwp_ref, gb_ref, dx_ref, dg_ref, xwin, bwin, gwin, sems
    ):
        """Inputs:
          xp_ref  (B, D+2, Hh, Ww) padded x                [HBM, DMA]
          gbp_ref (B, D+2, Hh, Ww) padded gbar             [HBM, DMA]
          gwp_ref (B, 75, Hh, Ww) padded guidance          [HBM, DMA]
          gb_ref  (1, 1, Ht, Wt) gbar tile                 [VMEM]
        Outputs:
          dx_ref  (1, 1, Ht, Wt)
          dg_ref  (1, 75, Ht, Wt) accumulated over the D grid dim
        xwin/bwin are (4, wh, ww) rotating padded-D slice buffers (see the
        forward kernel): one new slice per step, prefetched during compute.
        """
        b = pl.program_id(0)
        h = pl.program_id(1)
        w = pl.program_id(2)
        d = pl.program_id(3)

        def fetch_x(idx):
            return pltpu.make_async_copy(
                xp_ref.at[b, idx, pl.ds(h * Ht, wh), pl.ds(w * Wt, ww)],
                xwin.at[idx % 4],
                sems.at[idx % 4],
            )

        def fetch_b(idx):
            return pltpu.make_async_copy(
                gbp_ref.at[b, idx, pl.ds(h * Ht, wh), pl.ds(w * Wt, ww)],
                bwin.at[idx % 4],
                sems.at[4 + idx % 4],
            )

        @pl.when(d == 0)
        def _():
            for i in range(min(3, D + 2)):
                fetch_x(i).start()
                fetch_b(i).start()
            # The guidance window is d-independent: fetch once per spatial
            # tile (D is the innermost grid dim; scratch persists across it).
            cp3 = pltpu.make_async_copy(
                gwp_ref.at[b, :, pl.ds(h * Ht, wh), pl.ds(w * Wt, ww)],
                gwin,
                sems.at[8],
            )
            cp3.start()
            cp3.wait()

        fetch_x(d + 2).wait()
        fetch_b(d + 2).wait()

        @pl.when(d + 3 <= D + 1)
        def _():
            fetch_x(d + 3).start()
            fetch_b(d + 3).start()

        @pl.when(d == 0)
        def _():
            for i in range(min(2, D + 1)):
                fetch_x(i).wait()
                fetch_b(i).wait()

        f32 = jnp.float32
        # dx: transposed stencil.  bwin slices: [0]=gbar(d-1), [1]=gbar(d),
        # [2]=gbar(d+1).  Contribution of filter k at offset `off` to
        # dx(p, d) comes from gbar(p-off, d+delta) with delta: k0->0,
        # k1->+1, k2->-1.
        acc_dx = jnp.zeros((Ht, Wt), f32)
        for k, bslice in ((0, 1), (1, 2), (2, 0)):
            bw = bwin[(d + bslice) % 4].astype(f32)
            for iy in range(K):
                jy = _HALO_H + r - iy  # p-off window start
                for ix in range(K):
                    jx = _HALO_W + r - ix
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
            xs = xwin[(d + xslice) % 4].astype(f32)
            for iy in range(K):
                oy = _HALO_H + iy - r
                for ix in range(K):
                    ox = _HALO_W + ix - r
                    ch = k * K * K + iy * K + ix
                    contrib = gb * xs[oy : oy + Ht, ox : ox + Wt]
                    dg_ref[0, ch] = (
                        dg_ref[0, ch].astype(f32) + contrib
                    ).astype(dg_ref.dtype)

    return kernel


def _lga_bwd_once(
    x: jnp.ndarray, g75: jnp.ndarray, gbar: jnp.ndarray, radius: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B, D, H, W = x.shape
    K = 2 * radius + 1
    # Smaller W tile: the 75-channel guidance window must fit in VMEM.
    Ht, Wt = _pick_tiles(H, W, max_wt=128)
    Hp = _round_up(H, Ht)
    Wp = _round_up(W, Wt)
    xp = _pad_vol(x, Hp, Wp)
    gbp = _pad_vol(gbar, Hp, Wp)
    gwp = _pad_plane(g75, Hp, Wp)
    gb_tiles = _pad_tiles(gbar, Ht, Wt)

    grid = (B, Hp // Ht, Wp // Wt, D)
    dx, dg = pl.pallas_call(
        _make_bwd_kernel(K, Ht, Wt, D),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
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
            pltpu.VMEM((4, Ht + 2 * _HALO_H, Wt + 2 * _HALO_W), x.dtype),
            pltpu.VMEM((4, Ht + 2 * _HALO_H, Wt + 2 * _HALO_W), gbar.dtype),
            pltpu.VMEM(
                (3 * K * K, Ht + 2 * _HALO_H, Wt + 2 * _HALO_W), g75.dtype
            ),
            pltpu.SemaphoreType.DMA((9,)),
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
