"""Training loss.

Reference: train.py computes smooth-L1 between predicted and ground-truth
disparity on valid pixels only (0 < gt < max_disp), with deep-supervision
weights 0.2/0.6/1.0 over (disp0, disp1, disp2) (SURVEY.md §0 step 5, §2
#12)."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def smooth_l1_loss(
    pred: jnp.ndarray, target: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Mean smooth-L1 (Huber, delta=1) over valid pixels.

    pred/target/valid: (B, H, W).  Returns a scalar; 0 if no valid pixels.
    """
    diff = jnp.abs(pred - target)
    per_pixel = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
    num = jnp.sum(per_pixel * valid)
    den = jnp.maximum(jnp.sum(valid), 1.0)
    return num / den


def deep_supervision_loss(
    outputs: Sequence[jnp.ndarray],
    target: jnp.ndarray,
    valid: jnp.ndarray,
    weights: Sequence[float],
) -> jnp.ndarray:
    """Weighted sum of per-head smooth-L1 losses.

    If fewer heads than weights are given (lighter presets), the LAST
    len(outputs) weights are used so the final head always gets the
    reference's 1.0 weight."""
    weights = tuple(weights)[-len(outputs) :]
    total = 0.0
    for w, out in zip(weights, outputs):
        total = total + w * smooth_l1_loss(out, target, valid)
    return total
