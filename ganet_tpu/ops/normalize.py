"""Weight normalization helpers.

The reference normalizes SGA/LGA guidance weights to unit L1 mass along the
weight axis before feeding them to the CUDA kernels
(`F.normalize(..., p=1, dim=...)` in libGANet/module/GANet.py and
models/GANet_deep.py SGABlock/DispAgg — SURVEY.md §2 #6-#7).  Unit L1 mass
is what makes the SGA recurrence a contraction (non-divergent over long
sweeps)."""

from __future__ import annotations

import jax.numpy as jnp


def l1_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """Scale so that sum(|x|) == 1 along `axis`, preserving signs.

    Matches torch.nn.functional.normalize(x, p=1, dim=axis) semantics.
    """
    denom = jnp.sum(jnp.abs(x), axis=axis, keepdims=True)
    return x / jnp.maximum(denom, eps)
