"""Semi-Global Aggregation (SGA) — pure-JAX reference implementation.

Semantics (GA-Net paper eq. 5-6; reference CUDA kernels
libGANet/src/GANet_kernel.cu `sga_cuda_forward/backward`, SURVEY.md §0/§2
#1):  for each of four directions r in {left->right, right->left,
top->bottom, bottom->top}, sweep the cost volume sequentially along the
direction with the recurrence (per batch b, channel c, disparity d, pixel p)

    A_r(p, d) = w0(p) * C(p, d)
              + w1(p) * A_r(p - r, d)
              + w2(p) * A_r(p - r, d - 1)
              + w3(p) * A_r(p - r, d + 1)
              + w4(p) * max_{d'} A_r(p - r, d')

where the five weights are per-(pixel, channel, direction), normalized to
unit L1 mass by the caller (see `ops.normalize.l1_normalize`; the
normalization lives in the model's SGABlock exactly as in the reference).
At the first pixel of each sweep A_r = C (no predecessor).  Out-of-range
disparity neighbors (d-1 < 0, d+1 >= D) contribute zero.  The four
directional results are fused by an elementwise **max over directions** —
the paper's deliberate departure from SGM's sum.

TPU-first design: each sweep is a `lax.scan` along the sweep axis whose
carry is the previous aggregated slice (B, D, P, C) — the step body is a
handful of fused VPU elementwise ops plus one D-axis max, and the
perpendicular axis x disparity x channel provide ample vector parallelism.
This file is the differentiable semantics oracle (autodiff flows through
`lax.scan`); `sga_pallas.py` is the performance kernel checked against it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Direction order — fixed convention used across the codebase and kernels:
# 0: left->right (+W), 1: right->left (-W), 2: top->bottom (+H),
# 3: bottom->top (-H).
DIRECTIONS = ("lr", "rl", "tb", "bt")


def _sweep_along_leading(
    xs: jnp.ndarray,
    ws: jnp.ndarray,
    reverse: bool,
    initial=None,
    initial_valid=None,
) -> jnp.ndarray:
    """Scan the recurrence along the leading axis.

    Reverse sweeps use lax.scan(reverse=True) rather than materialized
    jnp.flip: besides saving two full-volume copies, flip composed with
    scan has been observed to miscompile on the TPU backend at large
    shapes (the Pallas kernels avoid flips for the same reason).

    Args:
      xs: (L, B, D, P, C) cost slices along the sweep axis.
      ws: (L, B, P, C, 5) normalized weights along the sweep axis.
      initial: optional (B, D, P, C) aggregated carry entering step 0.
      initial_valid: optional traced bool — when False, the sweep falls
        back to the reference boundary condition (first step copies x)
        even though `initial` was supplied.  Lets the cross-shard pipeline
        use ONE scan for both the pipeline-head shard and seeded shards.
    Returns:
      (L, B, D, P, C) aggregated slices (in array order).
    """

    def recurrence(prev, xt, wt):
        w = jnp.moveaxis(wt, -1, 0)[:, :, None]  # (5, B, 1, P, C)
        prev_dm1 = jnp.pad(prev[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
        prev_dp1 = jnp.pad(prev[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
        prev_max = jnp.max(prev, axis=1, keepdims=True)
        return (
            w[0] * xt
            + w[1] * prev
            + w[2] * prev_dm1
            + w[3] * prev_dp1
            + w[4] * prev_max
        )

    def step(prev, inputs):
        xt, wt = inputs  # (B, D, P, C), (B, P, C, 5)
        out = recurrence(prev, xt, wt)
        return out, out

    if initial is not None and initial_valid is not None:
        # One scan serving both boundary conditions: the first sweep step
        # selects between the seeded recurrence and the reference copy-x.
        L = xs.shape[0]
        first_idx = L - 1 if reverse else 0
        flags = jnp.arange(L) == first_idx

        def step_flagged(prev, inputs):
            xt, wt, is_first = inputs
            out = recurrence(prev, xt, wt)
            use_ref = jnp.logical_and(is_first, jnp.logical_not(initial_valid))
            out = jnp.where(use_ref, xt, out)
            return out, out

        _, out = lax.scan(step_flagged, initial, (xs, ws, flags), reverse=reverse)
        return out
    if initial is not None:
        # Seeded sweep (cross-shard pipeline): every step applies the full
        # recurrence; the seed is the aggregated carry entering step 0.
        _, out = lax.scan(step, initial, (xs, ws), reverse=reverse)
        return out
    if xs.shape[0] == 1:
        return xs[:1]
    if reverse:
        first = xs[-1]
        _, rest = lax.scan(step, first, (xs[:-1], ws[:-1]), reverse=True)
        return jnp.concatenate([rest, first[None]], axis=0)
    first = xs[0]
    _, rest = lax.scan(step, first, (xs[1:], ws[1:]))
    return jnp.concatenate([first[None], rest], axis=0)


def sga_sweep(
    x: jnp.ndarray,
    w: jnp.ndarray,
    axis: str,
    reverse: bool,
    initial=None,
    initial_valid=None,
) -> jnp.ndarray:
    """One directional sweep.

    Args:
      x: cost volume (B, D, H, W, C).
      w: weights for this direction (B, H, W, C, 5), L1-normalized over the
        last axis by the caller.
      axis: "h" (vertical sweep) or "w" (horizontal sweep).
      reverse: sweep from the far edge backwards.
      initial: optional (B, D, P, C) aggregated carry entering the first
        sweep step (P = the perpendicular axis).  None reproduces the
        reference boundary condition (first step copies x); a seed is used
        by the cross-shard pipeline (parallel/sharded_sga.py), where the
        carry arrives from the neighboring shard.
      initial_valid: optional traced bool paired with `initial` — when
        False the sweep applies the reference boundary condition instead
        of the seed (used by the wavefront pipeline, where the head shard
        of the pipeline has no upstream neighbor).
    Returns:
      aggregated volume, same shape as x.
    """
    if axis not in ("h", "w"):
        raise ValueError(f"axis must be 'h' or 'w', got {axis!r}")
    spatial = 2 if axis == "h" else 3  # index into (B, D, H, W, C)
    w_spatial = 1 if axis == "h" else 2  # index into (B, H, W, C, 5)

    xs = jnp.moveaxis(x, spatial, 0)  # (L, B, D, P, C)
    ws = jnp.moveaxis(w, w_spatial, 0)  # (L, B, P, C, 5)
    out = _sweep_along_leading(xs, ws, reverse, initial, initial_valid)
    return jnp.moveaxis(out, 0, spatial)


def sga(x: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Full SGA: four directional sweeps fused by max over directions.

    Args:
      x: cost volume (B, D, H, W, C).
      weights: (B, H, W, C, 4, 5) — per-direction 5-weight sets in the
        DIRECTIONS order, each L1-normalized over the last axis.
    Returns:
      (B, D, H, W, C) aggregated volume.
    """
    if weights.shape[-2:] != (4, 5):
        raise ValueError(f"weights must end in (4, 5), got {weights.shape}")
    out_lr = sga_sweep(x, weights[..., 0, :], axis="w", reverse=False)
    out_rl = sga_sweep(x, weights[..., 1, :], axis="w", reverse=True)
    out_tb = sga_sweep(x, weights[..., 2, :], axis="h", reverse=False)
    out_bt = sga_sweep(x, weights[..., 3, :], axis="h", reverse=True)
    return jnp.maximum(
        jnp.maximum(out_lr, out_rl), jnp.maximum(out_tb, out_bt)
    )
