"""Disparity regression and volume upsampling.

Reference: `DisparityRegression` in libGANet/module/GANet.py and the
`Disp`/`DispAgg` heads in models/GANet_deep.py (SURVEY.md §0 step 4, §2
#6-#7): trilinear-upsample the aggregated 1/3-resolution volume to full
resolution and full disparity count, softmax over the (negated) cost axis,
then take the expectation sum_d d * p(d) for sub-pixel disparity.

Because disparity bin d at 1/3 resolution corresponds to disparity 3d at
full resolution, trilinearly stretching the disparity axis 3x makes bin
indices of the upsampled volume equal full-resolution disparities directly
— no extra x3 factor (SURVEY.md §7 "hard parts": the x3 scaling lives in
the upsample).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def trilinear_upsample(
    x: jnp.ndarray, target_shape: Sequence[int]
) -> jnp.ndarray:
    """Trilinear resize of a (B, D, H, W) volume to (B, D', H', W').

    Mirrors torch F.interpolate(..., mode='trilinear', align_corners=False)
    closely enough for parity (jax.image 'linear' uses half-pixel centers,
    i.e. align_corners=False semantics).  Lowered by XLA to per-axis
    matmuls that run on the MXU.
    """
    B = x.shape[0]
    out_shape = (B,) + tuple(target_shape)
    return jax.image.resize(x, out_shape, method="linear")


def soft_argmin(cost: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Softmax over negated cost (soft-argmin probabilities)."""
    return jax.nn.softmax(-cost, axis=axis)


def disparity_regression(prob: jnp.ndarray, max_disp: int) -> jnp.ndarray:
    """Expectation over disparity bins.

    Args:
      prob: (B, D, H, W) probabilities over the disparity axis (axis 1),
        non-negative, summing to ~1 (DispAgg re-normalizes after its
        post-softmax LGA pass, as the reference does).
      max_disp: number of bins D; bin d <-> disparity d (pixels).
    Returns:
      (B, H, W) sub-pixel disparity map.
    """
    if prob.shape[1] != max_disp:
        raise ValueError(
            f"prob has {prob.shape[1]} disparity bins, expected {max_disp}"
        )
    disp_values = jnp.arange(max_disp, dtype=prob.dtype).reshape(1, max_disp, 1, 1)
    return jnp.sum(prob * disp_values, axis=1)
