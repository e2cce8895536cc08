"""Local Guided Aggregation (LGA) — pure-JAX reference implementation.

Semantics (GA-Net paper eq. 7; reference CUDA kernels
libGANet/src/GANet_kernel.cu `lga_cuda_forward/backward` and the
LGA/LGA2/LGA3 modules in libGANet/module/GANet.py, SURVEY.md §0/§2 #2,#6):
per-pixel local filtering of a (B, D, H, W) cost/probability volume with
three spatially-varying K x K filter banks (K = 2*radius + 1 = 5), one per
disparity offset {0, -1, +1}:

    out(p, d) = sum_{q in N_K(p)}  g0(p, q) * x(q, d)
                                 + g1(p, q) * x(q, d - 1)
                                 + g2(p, q) * x(q, d + 1)

with zero out-of-range neighbors in both space and disparity.  The 75
(= 3*K*K) guidance channels are L1-normalized over all 75 by the caller
(reference DispAgg does `F.normalize(g, p=1, dim=1)`).

TPU-first design: the spatially-varying stencil is expressed as 3*K*K fused
multiply-accumulates over statically shifted copies of the volume — pure
VPU work that XLA fuses into a single pass; no gather.  `lga_pallas.py`
provides the blocked kernel for the performance path.
"""

from __future__ import annotations

import jax.numpy as jnp


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out(p) = x(p + (dy, dx)) with zero fill; x is (..., H, W)."""
    H, W = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [
        (max(-dy, 0), max(dy, 0)),
        (max(-dx, 0), max(dx, 0)),
    ]
    x = jnp.pad(x, pad)
    ys = slice(max(dy, 0), max(dy, 0) + H)
    xs = slice(max(dx, 0), max(dx, 0) + W)
    return x[..., ys, xs]


def lga(
    x: jnp.ndarray, g: jnp.ndarray, radius: int = 2, repeats: int = 1
) -> jnp.ndarray:
    """Apply LGA `repeats` times (LGA / LGA2 / LGA3 in the reference).

    Args:
      x: (B, D, H, W) volume (disparity axis 1).
      g: (B, H, W, 3*K*K) guidance, K = 2*radius+1, laid out as
        (filter k, dy, dx) row-major in the last axis; caller normalizes.
      radius: stencil radius (reference uses 2 -> 5x5).
      repeats: number of successive applications with the same guidance.
    Returns:
      (B, D, H, W) filtered volume.
    """
    K = 2 * radius + 1
    if g.shape[-1] != 3 * K * K:
        raise ValueError(f"guidance must have {3 * K * K} channels, got {g.shape}")
    gk = g.reshape(g.shape[:3] + (3, K, K))  # (B, H, W, 3, K, K)

    for _ in range(repeats):
        x_dm1 = jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
        x_dp1 = jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
        out = jnp.zeros_like(x)
        for iy, dy in enumerate(range(-radius, radius + 1)):
            for ix, dx in enumerate(range(-radius, radius + 1)):
                w0 = gk[:, None, :, :, 0, iy, ix]  # (B, 1, H, W)
                w1 = gk[:, None, :, :, 1, iy, ix]
                w2 = gk[:, None, :, :, 2, iy, ix]
                out = out + (
                    w0 * _shift2d(x, dy, dx)
                    + w1 * _shift2d(x_dm1, dy, dx)
                    + w2 * _shift2d(x_dp1, dy, dx)
                )
        x = out
    return x
