"""Spatially-sharded SGA: the cost-volume analogue of sequence parallelism
(SURVEY.md §5 "Long-context / sequence parallelism", BASELINE.json config
#5).

The cost volume is sharded along H over the mesh axis 'space'.  Under
shard_map:

  * horizontal sweeps (along W) are embarrassingly parallel across H-shards
    — each device runs its local sweep, no communication;
  * vertical sweeps (along H) have a true sequential dependency across
    shards: shard i's sweep is seeded with the aggregated boundary row of
    shard i-1.  This runs as a linear pipeline: at stage s shard s runs its
    local (seeded) sweep and ppermutes its final row to shard s+1.  Wall
    time for one vertical sweep therefore matches the unsharded sweep (the
    recurrence is inherently sequential) while per-device memory drops by
    the shard count — and the other half of SGA (horizontal sweeps) plus
    all 3D convolutions do scale.  Wavefront pipelining (splitting W into
    chunks so shard s+1 starts before shard s finishes) is the planned
    follow-up optimization.

Gradients flow through the pipeline automatically: ppermute and the seeded
scan are both differentiable, so this module is usable in training.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ganet_tpu.ops.normalize import l1_normalize
from ganet_tpu.ops.sga import sga_sweep as _sweep


def _pipelined_vertical_sweep(x, w, reverse: bool, axis_name: str):
    """Local block of a vertical (along-H) sweep inside shard_map.

    x: (B, D, Hl, W, C) local shard; w: (B, Hl, W, C, 5).
    """
    S = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    B, D, Hl, W, C = x.shape

    if S == 1:
        return _sweep(x, w, "h", reverse)

    # Shard order along the sweep: for a reverse sweep the pipeline starts
    # at the last shard.
    my_stage = (S - 1 - idx) if reverse else idx
    if reverse:
        perm = [(i, i - 1) for i in range(1, S)]
    else:
        perm = [(i, i + 1) for i in range(S - 1)]

    def local_sweep(boundary, is_first_shard):
        # First shard of the pipeline uses the reference boundary condition
        # (first row copies x); downstream shards are seeded.
        seeded = _sweep(x, w, "h", reverse, initial=boundary)
        ref = _sweep(x, w, "h", reverse)
        return jnp.where(is_first_shard, ref, seeded)

    def body(s, state):
        boundary, result = state
        local = local_sweep(boundary, jnp.logical_and(my_stage == 0, s == 0))
        # Freeze my result at my stage.
        result = jnp.where(my_stage == s, local, result)
        # Boundary row leaving this shard toward the next stage.
        last = local[:, :, 0, :, :] if reverse else local[:, :, -1, :, :]
        nb = lax.ppermute(last, axis_name, perm)
        boundary = jnp.where(my_stage == s + 1, nb, boundary)
        return boundary, result

    # Derive the zero seed from x so it carries the same shard_map
    # "varying over axis" type as the loop body's output.
    boundary0 = x[:, :, 0, :, :] * 0.0
    _, result = lax.fori_loop(
        0, S, body, (boundary0, jnp.zeros_like(x))
    )
    return result


def _sharded_sga_local(x, w, axis_name: str):
    """Full SGA on an H-sharded local block: 2 local horizontal sweeps, 2
    pipelined vertical sweeps, max fusion."""
    out_lr = _sweep(x, w[..., 0, :], "w", False)
    out_rl = _sweep(x, w[..., 1, :], "w", True)
    out_tb = _pipelined_vertical_sweep(x, w[..., 2, :], False, axis_name)
    out_bt = _pipelined_vertical_sweep(x, w[..., 3, :], True, axis_name)
    return jnp.maximum(
        jnp.maximum(out_lr, out_rl), jnp.maximum(out_tb, out_bt)
    )


def sharded_sga(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "space",
) -> jnp.ndarray:
    """SGA over a cost volume sharded along H on `axis_name`.

    Same contract as ops.sga.sga: x (B, D, H, W, C), weights
    (B, H, W, C, 4, 5) L1-normalized by the caller.  H must be divisible
    by the shard count.
    """
    if weights.shape[-2:] != (4, 5):
        raise ValueError(f"weights must end in (4, 5), got {weights.shape}")
    spec_x = P(None, None, axis_name, None, None)
    spec_w = P(None, axis_name, None, None, None, None)
    fn = shard_map(
        functools.partial(_sharded_sga_local, axis_name=axis_name),
        mesh=mesh,
        in_specs=(spec_x, spec_w),
        out_specs=spec_x,
    )
    return fn(x, weights)
