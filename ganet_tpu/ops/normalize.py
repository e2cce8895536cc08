"""Weight normalization helpers.

The reference normalizes SGA/LGA guidance weights to unit mass along the
weight axis before feeding them to the CUDA kernels (libGANet/module/GANet.py
and models/GANet_deep.py SGABlock/DispAgg — SURVEY.md §2 #6-#7).  Unit mass
is what makes the SGA recurrence a contraction (non-divergent over long
sweeps).

UNRESOLVED vs the reference (the mount is empty — SURVEY.md provenance
warning): SURVEY §0 describes the 5 SGA weights as **softmax**-normalized,
while the module-level recollection is `F.normalize(p=1)` (L1).  Both are
implemented; `ModelConfig.sga_norm` selects ("l1" default).  Pin this down
against the real source the moment the reference mount reappears — it is a
silent accuracy risk, not a crash risk (both keep the recurrence stable)."""

from __future__ import annotations

import jax.nn
import jax.numpy as jnp


def l1_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """Scale so that sum(|x|) == 1 along `axis`, preserving signs.

    Matches torch.nn.functional.normalize(x, p=1, dim=axis) semantics.
    """
    denom = jnp.sum(jnp.abs(x), axis=axis, keepdims=True)
    return x / jnp.maximum(denom, eps)


def normalize_weights(
    x: jnp.ndarray, method: str = "l1", axis: int = -1
) -> jnp.ndarray:
    """Normalize guidance weight sets to unit mass along `axis`.

    method: "l1" (F.normalize p=1 — signed, sum(|w|)=1) or "softmax"
    (positive, sum(w)=1; SURVEY.md §0's reading of the SGA paper).
    """
    if method == "l1":
        return l1_normalize(x, axis=axis)
    if method == "softmax":
        return jax.nn.softmax(x, axis=axis)
    raise ValueError(f"unknown weight normalization {method!r}")
