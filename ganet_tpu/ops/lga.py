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

TPU-first design: the spatially-varying stencil runs as a `lax.scan` over
the K*K window offsets — each step one dynamic-slice of the zero-padded
volume plus a fused multiply-accumulate on the VPU.  (A fully unrolled
3*K*K formulation is mathematically identical but XLA's fusion of 75
overlapping shifted terms explodes compile time superlinearly; the scan
form compiles in seconds and differentiates as a 25-step reverse scan.)
`lga_pallas.py` provides the blocked TPU kernel for the performance path.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


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
    B, D, H, W = x.shape
    # (B, H, W, 3, K*K) -> (K*K, 3, B, 1, H, W) scan inputs.
    gk = g.reshape(g.shape[:3] + (3, K * K))
    gs = jnp.transpose(gk, (4, 3, 0, 1, 2))[:, :, :, None]

    for _ in range(repeats):
        x_dm1 = jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
        x_dp1 = jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
        # (3, B, D, H, W), zero-padded by `radius` in the spatial dims.
        x3 = jnp.stack([x, x_dm1, x_dp1])
        x3p = jnp.pad(
            x3, ((0, 0), (0, 0), (0, 0), (radius, radius), (radius, radius))
        )

        def step(acc, inp):
            off, gw = inp  # scalar offset index, (3, B, 1, H, W) weights
            iy, ix = off // K, off % K
            win = lax.dynamic_slice(x3p, (0, 0, 0, iy, ix), (3, B, D, H, W))
            return acc + jnp.sum(gw * win, axis=0), None

        x, _ = lax.scan(
            step, jnp.zeros_like(x), (jnp.arange(K * K), gs)
        )
    return x


def lga3d(
    x: jnp.ndarray, g: jnp.ndarray, radius: int = 2, repeats: int = 1
) -> jnp.ndarray:
    """LGA over a multi-channel cost volume (reference `Lga3dFunction` /
    `lga3d_cuda_forward/backward` in libGANet, SURVEY.md §2 #1-#5): the same
    per-pixel 3x(KxK) guided filter applied independently to every channel,
    with the guidance shared across channels.

    Args:
      x: (B, D, H, W, C) volume (channels-last, this codebase's layout for
        multi-channel cost volumes).
      g: (B, H, W, 3*K*K) guidance, normalized by the caller.
    Returns:
      (B, D, H, W, C) filtered volume.
    """
    B, D, H, W, C = x.shape
    # Fold channels into batch: (B, C, D, H, W) -> (B*C, D, H, W); the
    # guidance repeats per channel in matching order.
    xf = jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(B * C, D, H, W)
    gf = jnp.repeat(g, C, axis=0)
    out = lga(xf, gf, radius=radius, repeats=repeats)
    return jnp.transpose(out.reshape(B, C, D, H, W), (0, 2, 3, 4, 1))
