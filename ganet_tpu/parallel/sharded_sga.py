"""Spatially-sharded SGA: the cost-volume analogue of sequence parallelism
(SURVEY.md §5 "Long-context / sequence parallelism", BASELINE.json config
#5).

The cost volume is sharded along H over the mesh axis 'space'.  Under
shard_map:

  * horizontal sweeps (along W) are embarrassingly parallel across H-shards
    — each device runs its local sweep, no communication;
  * vertical sweeps (along H) have a true sequential dependency across
    shards: shard i's sweep is seeded with the aggregated boundary row of
    shard i-1.  This runs as a WAVEFRONT pipeline over W-chunks (the same
    schedule ring-attention uses for its sequential dimension): shard s
    sweeps chunk c at step t = s + c and forwards the chunk's boundary row
    with ppermute, so every shard is busy once the pipeline fills and the
    vertical sweep's wall time approaches T_unsharded / S for
    chunks >> S, instead of the naive S * T_local.

Gradients flow through the pipeline automatically: ppermute and the seeded
scan are both differentiable, so this module is usable in training.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ganet_tpu.ops.normalize import l1_normalize
from ganet_tpu.ops.sga import sga_sweep as _sweep


def _local_horizontal_sweep(x, w, reverse: bool, impl: str):
    """Along-W sweep of the local block — no cross-shard dependency, so the
    Pallas kernel can run as-is inside shard_map (impl='pallas')."""
    if impl == "pallas":
        from ganet_tpu.ops import sga_pallas

        return sga_pallas.sga_sweep(x, w, "w", reverse)
    return _sweep(x, w, "w", reverse)


def _local_seeded_sweep(x, w, reverse, initial, initial_valid, impl: str):
    """One seeded along-H sweep of a local W-chunk (the wavefront's unit of
    work).  impl='pallas' runs the seeded Pallas kernel (boundary carry in
    VMEM, custom VJP emitting dL/dseed for the reverse pipeline)."""
    if impl == "pallas":
        from ganet_tpu.ops import sga_pallas

        return sga_pallas.sga_sweep(
            x, w, "h", reverse, initial=initial, initial_valid=initial_valid
        )
    return _sweep(
        x, w, "h", reverse, initial=initial, initial_valid=initial_valid
    )


def _pipelined_vertical_sweep(
    x, w, reverse: bool, axis_name: str, chunks: int = 0, impl: str = "scan"
):
    """Local block of a vertical (along-H) sweep inside shard_map, run as a
    WAVEFRONT pipeline over W-chunks.

    x: (B, D, Hl, W, C) local shard; w: (B, Hl, W, C, 5).

    Shard s (in sweep order) processes W-chunk c at wavefront step
    t = s + c: it runs the seeded local sweep on that chunk and ppermutes
    the chunk's final boundary row to shard s+1, which consumes it at step
    t+1.  All shards are busy once the pipeline fills, so a vertical sweep
    costs (S + chunks - 1)/chunks local-chunk sweeps of wall time
    (~T_local for chunks >> S) instead of S full local sweeps — the
    classic wavefront over an inherently sequential recurrence.
    """
    S = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    B, D, Hl, W, C = x.shape

    if S == 1:
        return _local_seeded_sweep(x, w, reverse, None, None, impl)

    if chunks <= 0:
        # Enough chunks to keep pipeline fill low while keeping each chunk
        # lane-friendly (>= 128 wide where possible).
        chunks = max(1, min(4 * S, W // 128)) if W >= 128 else 1
    while W % chunks:
        chunks -= 1
    Wc = W // chunks

    # Shard order along the sweep: for a reverse sweep the pipeline starts
    # at the last shard.
    my_stage = (S - 1 - idx) if reverse else idx
    if reverse:
        perm = [(i, i - 1) for i in range(1, S)]
    else:
        perm = [(i, i + 1) for i in range(S - 1)]

    head = my_stage == 0  # no upstream neighbor: reference boundary cond.

    def body(t, state):
        boundary, result = state  # boundary: (B, D, Wc, C) seed row chunk
        c = t - my_stage
        active = jnp.logical_and(c >= 0, c < chunks)
        cw = jnp.clip(c, 0, chunks - 1) * Wc
        xc = lax.dynamic_slice(x, (0, 0, 0, cw, 0), (B, D, Hl, Wc, C))
        wc = lax.dynamic_slice(w, (0, 0, cw, 0, 0), (B, Hl, Wc, C, 5))
        local = _local_seeded_sweep(
            xc, wc, reverse, boundary, jnp.logical_not(head), impl
        )
        result = jnp.where(
            active,
            lax.dynamic_update_slice(result, local, (0, 0, 0, cw, 0)),
            result,
        )
        # This chunk's outgoing boundary row; shard s+1 consumes it at t+1.
        last = local[:, :, 0, :, :] if reverse else local[:, :, -1, :, :]
        boundary = lax.ppermute(last, axis_name, perm)
        return boundary, result

    # Derive the zero seed from x so it carries the same shard_map
    # "varying over axis" type as the loop body's output.
    boundary0 = x[:, :, 0, :Wc, :] * 0.0
    _, result = lax.fori_loop(
        0, S + chunks - 1, body, (boundary0, jnp.zeros_like(x))
    )
    return result


def _sharded_sga_local(
    x, w, axis_name: str, chunks: int = 0, impl: str = "scan"
):
    """Full SGA on an H-sharded local block: 2 local horizontal sweeps, 2
    pipelined vertical sweeps, max fusion.

    impl='pallas' runs every local sweep through the Pallas kernels: the
    horizontal sweeps are shard-local, and the vertical wavefront uses the
    seeded kernel (boundary carry in VMEM, dL/dseed VJP) for each W-chunk.
    """
    out_lr = _local_horizontal_sweep(x, w[..., 0, :], False, impl)
    out_rl = _local_horizontal_sweep(x, w[..., 1, :], True, impl)
    out_tb = _pipelined_vertical_sweep(
        x, w[..., 2, :], False, axis_name, chunks, impl
    )
    out_bt = _pipelined_vertical_sweep(
        x, w[..., 3, :], True, axis_name, chunks, impl
    )
    return jnp.maximum(
        jnp.maximum(out_lr, out_rl), jnp.maximum(out_tb, out_bt)
    )


def sharded_sga(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "space",
    chunks: int = 0,
    batch_axis: Optional[str] = None,
    impl: str = "scan",
) -> jnp.ndarray:
    """SGA over a cost volume sharded along H on `axis_name`.

    Same contract as ops.sga.sga: x (B, D, H, W, C), weights
    (B, H, W, C, 4, 5) L1-normalized by the caller.  H must be divisible
    by the shard count.  `chunks` sets the W-chunk count of the vertical
    wavefront pipeline (0 = auto: ~4x the shard count, lane-aligned).
    `batch_axis` additionally shards the batch dim (the model path passes
    'data' so the global batch stays data-parallel through the shard_map
    instead of being gathered).  `impl` selects the local sweep kernel
    ('scan' oracle or 'pallas' for the horizontal sweeps).
    """
    if weights.shape[-2:] != (4, 5):
        raise ValueError(f"weights must end in (4, 5), got {weights.shape}")
    spec_x = P(batch_axis, None, axis_name, None, None)
    spec_w = P(batch_axis, axis_name, None, None, None, None)
    # check_vma=False: pallas_call custom-calls inside the body don't carry
    # varying-mesh-axes metadata, and the static replication check cannot
    # see through them (numerics are unaffected; parity is tested).
    fn = jax.shard_map(
        functools.partial(
            _sharded_sga_local, axis_name=axis_name, chunks=chunks, impl=impl
        ),
        mesh=mesh,
        in_specs=(spec_x, spec_w),
        out_specs=spec_x,
        check_vma=False,
    )
    return fn(x, weights)
