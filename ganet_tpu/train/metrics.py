"""Evaluation metrics.

Reference: the validation snippets in train.py and the KITTI protocol
(SURVEY.md §2 #14, §6): EPE (mean absolute disparity error on valid
pixels), >t-px error rates, and KITTI D1-all (error > 3 px AND > 5% of
ground truth).  All jitted-friendly (masked means, no boolean indexing).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def disparity_metrics(
    pred: jnp.ndarray, target: jnp.ndarray, valid: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """pred/target/valid: (B, H, W) -> dict of scalar metrics."""
    err = jnp.abs(pred - target)
    n = jnp.maximum(jnp.sum(valid), 1.0)

    def masked_rate(cond):
        return jnp.sum(cond.astype(jnp.float32) * valid) / n

    d1 = (err > 3.0) & (err > 0.05 * jnp.abs(target))
    return {
        "epe": jnp.sum(err * valid) / n,
        "rate_1px": masked_rate(err > 1.0),
        "rate_2px": masked_rate(err > 2.0),
        "rate_3px": masked_rate(err > 3.0),
        "d1_all": masked_rate(d1),
        "valid_frac": jnp.mean(valid),
        # Valid-pixel count: lets callers aggregate pixel-weighted means
        # across batches of unequal valid coverage (Trainer.evaluate).
        "valid_px": jnp.sum(valid),
    }
