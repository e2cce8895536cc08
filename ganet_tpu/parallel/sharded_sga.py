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
import logging
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


def chunk_layout(W: int, chunks: int = 0) -> tuple:
    """(chunk_width, start_columns) of the wavefront's W-chunking.

    Columns are independent in a vertical sweep, so chunks may OVERLAP: the
    last chunk starts at W - Wc even when Wc does not divide W, recomputing
    a few columns instead of masking a ragged tail.  Auto (chunks=0) uses
    lane-width (128-column) chunks — at the flagship 1/3-res width 320 that
    is 3 chunks where the old divide-only rule gave 2 (VERDICT r2 weak #2).
    """
    if chunks <= 0:
        Wc = 128 if W >= 128 else W
    else:
        Wc = -(-W // min(chunks, W))
    n = -(-W // Wc)
    starts = [min(c * Wc, W - Wc) for c in range(n)]
    return Wc, starts


def pipeline_stats(S: int, chunks: int) -> dict:
    """Static utilization accounting of the fused two-direction wavefront.

    critical_chunk_sweeps = sum over wavefront steps of the busiest shard's
    task count (1 step where only one direction's wave covers a shard, 2
    where both overlap); the unfused schedule costs 2*(S + chunks - 1).
    """
    steps = S + chunks - 1
    crit = 0
    for t in range(steps):
        m = 0
        for s in range(S):
            tasks = int(0 <= t - s < chunks) + int(0 <= t - (S - 1 - s) < chunks)
            m = max(m, tasks)
        crit += m
    per_shard = 2 * chunks  # useful chunk-sweeps each shard must run
    return {
        "shards": S,
        "chunks": chunks,
        "steps": steps,
        "critical_chunk_sweeps": crit,
        "unfused_chunk_sweeps": 2 * steps,
        "utilization": per_shard / crit if crit else 1.0,
    }


def _fused_vertical_sweeps(
    x,
    w_tb,
    w_bt,
    axis_name: str,
    chunks: int = 0,
    impl: str = "scan",
    force_pipeline: bool = False,
):
    """Both vertical (along-H) sweeps inside shard_map, run as ONE fused
    WAVEFRONT pipeline over W-chunks.

    x: (B, D, Hl, W, C) local shard; w_tb/w_bt: (B, Hl, W, C, 5).

    Shard s (in sweep order) processes W-chunk c at wavefront step
    t = s + c: it runs the seeded local sweep on that chunk and ppermutes
    the chunk's final boundary row to shard s+1, which consumes it at step
    t+1.  The top-down wave enters at shard 0 and the bottom-up wave at
    shard S-1, so each direction's fill/drain bubbles are the other's busy
    steps: a shard skips inactive directions via lax.cond, and the fused
    loop's critical path is pipeline_stats(S, chunks)
    ["critical_chunk_sweeps"] instead of the two sequential pipelines'
    2*(S + chunks - 1) (e.g. S=4, chunks=3: 8 vs 12 chunk-sweeps).
    """
    S = lax.axis_size(axis_name)
    B, D, Hl, W, C = x.shape

    if S == 1 and not force_pipeline:
        return (
            _local_seeded_sweep(x, w_tb, False, None, None, impl),
            _local_seeded_sweep(x, w_bt, True, None, None, impl),
        )

    idx = lax.axis_index(axis_name)
    Wc, starts = chunk_layout(W, chunks)
    nchunks = len(starts)
    starts_arr = jnp.asarray(starts, jnp.int32)

    stage_tb = idx
    stage_bt = S - 1 - idx
    perm_fwd = [(i, i + 1) for i in range(S - 1)]
    perm_rev = [(i, i - 1) for i in range(1, S)]

    def dir_step(t, boundary, result, w, reverse, stage):
        c = t - stage
        active = jnp.logical_and(c >= 0, c < nchunks)
        cw = starts_arr[jnp.clip(c, 0, nchunks - 1)]
        head = stage == 0  # no upstream neighbor: reference boundary cond.

        def run(operands):
            boundary, result = operands
            xc = lax.dynamic_slice(x, (0, 0, 0, cw, 0), (B, D, Hl, Wc, C))
            wc = lax.dynamic_slice(w, (0, 0, cw, 0, 0), (B, Hl, Wc, C, 5))
            local = _local_seeded_sweep(
                xc, wc, reverse, boundary, jnp.logical_not(head), impl
            )
            result = lax.dynamic_update_slice(
                result, local, (0, 0, 0, cw, 0)
            )
            # Outgoing boundary row; shard s+1 consumes it at t+1.
            last = local[:, :, 0, :, :] if reverse else local[:, :, -1, :, :]
            return result, last

        def skip(operands):
            boundary, result = operands
            return result, boundary

        return lax.cond(active, run, skip, (boundary, result))

    def body(t, state):
        b_tb, b_bt, r_tb, r_bt = state
        r_tb, last_tb = dir_step(t, b_tb, r_tb, w_tb, False, stage_tb)
        r_bt, last_bt = dir_step(t, b_bt, r_bt, w_bt, True, stage_bt)
        # Both permutes after both sweeps so the transfers overlap.
        b_tb = lax.ppermute(last_tb, axis_name, perm_fwd)
        b_bt = lax.ppermute(last_bt, axis_name, perm_rev)
        return b_tb, b_bt, r_tb, r_bt

    # Derive the zero seed from x so it carries the same shard_map
    # "varying over axis" type as the loop body's output.
    boundary0 = x[:, :, 0, :Wc, :] * 0.0
    _, _, r_tb, r_bt = lax.fori_loop(
        0,
        S + nchunks - 1,
        body,
        (boundary0, boundary0, jnp.zeros_like(x), jnp.zeros_like(x)),
    )
    return r_tb, r_bt


def _sharded_sga_local(
    x,
    w,
    axis_name: str,
    chunks: int = 0,
    impl: str = "scan",
    force_pipeline: bool = False,
):
    """Full SGA on an H-sharded local block: 2 local horizontal sweeps, 2
    pipelined vertical sweeps, max fusion.

    impl='pallas' runs every local sweep through the Pallas kernels: the
    horizontal sweeps are shard-local, and the vertical wavefront uses the
    seeded kernel (boundary carry in VMEM, dL/dseed VJP) for each W-chunk.
    """
    out_lr = _local_horizontal_sweep(x, w[..., 0, :], False, impl)
    out_rl = _local_horizontal_sweep(x, w[..., 1, :], True, impl)
    out_tb, out_bt = _fused_vertical_sweeps(
        x, w[..., 2, :], w[..., 3, :], axis_name, chunks, impl,
        force_pipeline,
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
    force_pipeline: bool = False,
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
    `force_pipeline` runs the chunked wavefront machinery (fori_loop +
    cond + dynamic slices + ppermute) even at S=1, where it is pure
    overhead — used by scripts/bench_wavefront.py to measure the
    machinery's fixed cost on one real chip.
    """
    if weights.shape[-2:] != (4, 5):
        raise ValueError(f"weights must end in (4, 5), got {weights.shape}")
    S = mesh.shape[axis_name]
    if S > 1:
        # Outside the traced body (ADVICE r3): inside shard_map this fired
        # only at trace time and re-logged on every recompile.
        _, starts = chunk_layout(x.shape[3], chunks)
        logging.getLogger(__name__).debug(
            "sga wavefront: %s", pipeline_stats(S, len(starts))
        )
    spec_x = P(batch_axis, None, axis_name, None, None)
    spec_w = P(batch_axis, axis_name, None, None, None, None)
    # check_vma=False: pallas_call custom-calls inside the body don't carry
    # varying-mesh-axes metadata, and the static replication check cannot
    # see through them (numerics are unaffected; parity is tested).
    fn = jax.shard_map(
        functools.partial(
            _sharded_sga_local,
            axis_name=axis_name,
            chunks=chunks,
            impl=impl,
            force_pipeline=force_pipeline,
        ),
        mesh=mesh,
        in_specs=(spec_x, spec_w),
        out_specs=spec_x,
        check_vma=False,
    )
    return fn(x, weights)
