"""Semi-Global Aggregation — Pallas TPU kernels.

TPU-native replacement for the reference's hand-written CUDA kernels
(libGANet/src/GANet_kernel.cu sga_cuda_forward/backward, SURVEY.md §2 #1):
each directional sweep is a sequential recurrence along one spatial axis,
vectorized over (disparity x perpendicular-axis) on the VPU.

Kernel geometry (per sweep):
  canonical layout (N, L, D, M):
    N = batch * channels   (grid dim, embarrassingly parallel)
    L = sweep axis         (sequential; NOT in the tiled last-two dims, so
                            per-step dynamic indexing loads one contiguous
                            (D, M) tile and works for any dtype; blocked,
                            carry persists in VMEM scratch across L-blocks
                            — the TPU grid iterates the last grid dim
                            innermost, so blocks of the same (n, m) line
                            run back-to-back)
    D = disparity bins     (sublanes; shifts/max run along this axis)
    M = perpendicular axis (lanes, 128-wide tiles)
  Horizontal sweeps transpose H<->W outside the kernel so that the sweep
  axis is never the lane axis.  Reverse sweeps are NOT materialized as
  flips: the kernel walks L-blocks in reverse via the BlockSpec index map
  and iterates within blocks back-to-front.  (Besides saving four
  full-volume copies per direction pair, this sidesteps an XLA
  layout/fusion miscompile observed when jnp.flip composes with the
  pallas custom call at large shapes.)

I/O may be bfloat16; the recurrence accumulates in float32 internally
(hundreds of sequential multiply-adds would drift in bf16).

The recurrence per sweep step s at position l (weights L1-normalized by
the caller, first step copies the input — same semantics as ops/sga.py,
which is the tested oracle for this kernel):

    A[s] = w0*x[l] + w1*A[s-1] + w2*A[s-1](d-1) + w3*A[s-1](d+1)
         + w4*max_d A[s-1]

Backward (custom VJP, derived from the recurrence transpose; g is the
gradient carry running in the opposite order of the forward sweep):

    g[s]   = gbar[l] + w1[s+1]*g[s+1] + w2[s+1]*g[s+1](shift-up)
           + w3[s+1]*g[s+1](shift-down)
           + w4[s+1]*(sum_d g[s+1]) * onehot(argmax_d A[s])
    dx[l]  = w0[l]*g[s]              (dx at s==0 is g)
    dw*[l] = per-weight contractions of g[s] with x[l] / shifted A[s-1]
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _pick_l_block(D: int, L: int, budget_bytes: int) -> int:
    """Largest L-block such that one (Lb, D, 128) f32 block fits budget."""
    per_step = D * _LANES * 4
    lb = max(8, budget_bytes // per_step)
    return int(min(L, lb))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _make_fwd_kernel(L_total: int, Lb: int, nlb: int, reverse: bool):
    def kernel(x_ref, w_ref, o_ref, carry_ref):
        """x (1, Lb, D, Mt), w (1, Lb, 5, Mt), o (1, Lb, D, Mt),
        carry (D, Mt) f32 VMEM scratch persisting across L-blocks."""
        lb = pl.program_id(2)
        block_index = (nlb - 1 - lb) if reverse else lb

        @pl.when(lb == 0)
        def _():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        def step(j, prev):
            i = (Lb - 1 - j) if reverse else j
            l_global = block_index * Lb + i
            # Partial tail block: in forward order it is visited last, so
            # out-of-range steps cannot contaminate anything; in reverse
            # order it is visited FIRST, so they must not advance the carry.
            in_range = l_global < L_total
            first = l_global == (L_total - 1 if reverse else 0)

            xt = x_ref[0, i].astype(jnp.float32)  # (D, Mt)
            wt = w_ref[0, i].astype(jnp.float32)  # (5, Mt)
            w0, w1, w2, w3, w4 = (wt[k][None, :] for k in range(5))
            zero = jnp.zeros((1, prev.shape[1]), prev.dtype)
            prev_dm1 = jnp.concatenate([zero, prev[:-1]], axis=0)
            prev_dp1 = jnp.concatenate([prev[1:], zero], axis=0)
            pmax = jnp.max(prev, axis=0, keepdims=True)
            out = w0 * xt + w1 * prev + w2 * prev_dm1 + w3 * prev_dp1 + w4 * pmax
            out = jnp.where(first, xt, out)
            o_ref[0, i] = out.astype(o_ref.dtype)
            return jnp.where(in_range, out, prev)

        carry_ref[:] = lax.fori_loop(0, Lb, step, carry_ref[:])

    return kernel


def _make_fwd_kernel_seeded(L_total: int, Lb: int, nlb: int, reverse: bool):
    """Seeded variant for the cross-shard wavefront pipeline
    (parallel/sharded_sga.py): the carry entering the first sweep step is a
    boundary row from the neighboring shard instead of the reference
    copy-x boundary condition.  `valid` (f32 0/1 scalar) selects at trace
    runtime between the seeded recurrence and the reference condition, so
    ONE compiled kernel serves both the pipeline-head shard and the rest —
    mirroring ops/sga.py's step_flagged scan."""

    def kernel(x_ref, w_ref, seed_ref, valid_ref, o_ref, carry_ref):
        lb = pl.program_id(2)
        block_index = (nlb - 1 - lb) if reverse else lb
        valid = valid_ref[0, 0] != 0.0

        @pl.when(lb == 0)
        def _():
            carry_ref[:] = seed_ref[0].astype(jnp.float32)

        def step(j, prev):
            i = (Lb - 1 - j) if reverse else j
            l_global = block_index * Lb + i
            in_range = l_global < L_total
            first = l_global == (L_total - 1 if reverse else 0)

            xt = x_ref[0, i].astype(jnp.float32)
            wt = w_ref[0, i].astype(jnp.float32)
            w0, w1, w2, w3, w4 = (wt[k][None, :] for k in range(5))
            zero = jnp.zeros((1, prev.shape[1]), prev.dtype)
            prev_dm1 = jnp.concatenate([zero, prev[:-1]], axis=0)
            prev_dp1 = jnp.concatenate([prev[1:], zero], axis=0)
            pmax = jnp.max(prev, axis=0, keepdims=True)
            out = w0 * xt + w1 * prev + w2 * prev_dm1 + w3 * prev_dp1 + w4 * pmax
            out = jnp.where(
                jnp.logical_and(first, jnp.logical_not(valid)), xt, out
            )
            o_ref[0, i] = out.astype(o_ref.dtype)
            return jnp.where(in_range, out, prev)

        carry_ref[:] = lax.fori_loop(0, Lb, step, carry_ref[:])

    return kernel


def _sweep_fwd_canonical_seeded(
    x: jnp.ndarray,
    w: jnp.ndarray,
    seed: jnp.ndarray,
    valid: jnp.ndarray,
    reverse: bool,
) -> jnp.ndarray:
    """x (N, L, D, M), w (N, L, 5, M), seed (N, D, M), valid (1, 1) f32."""
    N, L, D, M = x.shape
    Lb = _pick_l_block(D, L, 1 * 1024 * 1024)
    nlb = pl.cdiv(L, Lb)
    grid = (N, pl.cdiv(M, _LANES), nlb)
    if reverse:
        lmap = lambda n, m, l: (n, nlb - 1 - l, 0, m)
    else:
        lmap = lambda n, m, l: (n, l, 0, m)
    smap = lambda n, m, l: (n, 0, m)
    return pl.pallas_call(
        _make_fwd_kernel_seeded(L, Lb, nlb, reverse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Lb, D, _LANES), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lb, 5, _LANES), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, _LANES), smap, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1), lambda n, m, l: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, Lb, D, _LANES), lmap, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, L, D, M), x.dtype),
        scratch_shapes=[pltpu.VMEM((D, _LANES), jnp.float32)],
        interpret=_interpret(),
    )(x, w, seed, valid)


def _sweep_fwd_canonical(
    x: jnp.ndarray, w: jnp.ndarray, reverse: bool
) -> jnp.ndarray:
    """x (N, L, D, M), w (N, L, 5, M) -> A (N, L, D, M) in array order."""
    N, L, D, M = x.shape
    Lb = _pick_l_block(D, L, 1 * 1024 * 1024)
    nlb = pl.cdiv(L, Lb)
    grid = (N, pl.cdiv(M, _LANES), nlb)
    if reverse:
        lmap = lambda n, m, l: (n, nlb - 1 - l, 0, m)
    else:
        lmap = lambda n, m, l: (n, l, 0, m)
    return pl.pallas_call(
        _make_fwd_kernel(L, Lb, nlb, reverse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Lb, D, _LANES), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lb, 5, _LANES), lmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Lb, D, _LANES), lmap, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, L, D, M), x.dtype),
        scratch_shapes=[pltpu.VMEM((D, _LANES), jnp.float32)],
        interpret=_interpret(),
    )(x, w)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _make_bwd_kernel(L_total: int, Lb: int, nlb: int, reverse: bool):
    """Gradient sweep running opposite to the forward order: for a forward
    (reverse=False) sweep it walks L from the end backwards (and therefore
    meets the partial tail block first — masked); for a reverse sweep it
    walks L naturally."""

    def kernel(x_ref, w_ref, aprev_ref, gbar_ref, dx_ref, dw_ref, carry_ref):
        lb = pl.program_id(2)
        block_index = lb if reverse else (nlb - 1 - lb)

        @pl.when(lb == 0)
        def _():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        def step(j, c):
            i = j if reverse else (Lb - 1 - j)
            l_global = block_index * Lb + i
            in_range = l_global < L_total
            # sweep-order first step (s == 0): where the forward copied x.
            is_sweep_first = l_global == (L_total - 1 if reverse else 0)
            live = jnp.where(in_range, 1.0, 0.0)

            f32 = jnp.float32
            xt = x_ref[0, i].astype(f32)  # (D, Mt)
            ap = aprev_ref[0, i].astype(f32)  # A at previous sweep position
            gb = gbar_ref[0, i].astype(f32) * live
            wt = w_ref[0, i].astype(f32) * live  # (5, Mt)
            w0, w1, w2, w3, w4 = (wt[k][None, :] for k in range(5))

            g = gb + c

            dx = jnp.where(is_sweep_first, g, w0 * g)
            dx_ref[0, i] = dx.astype(dx_ref.dtype)

            # dw contractions (zero at sweep-first: weights unused there).
            wlive = live * jnp.where(is_sweep_first, 0.0, 1.0)
            zero = jnp.zeros((1, g.shape[1]), g.dtype)
            ap_dm1 = jnp.concatenate([zero, ap[:-1]], axis=0)
            ap_dp1 = jnp.concatenate([ap[1:], zero], axis=0)
            ap_max = jnp.max(ap, axis=0, keepdims=True)
            gsum = jnp.sum(g, axis=0, keepdims=True)
            dw = jnp.concatenate(
                [
                    jnp.sum(g * xt, axis=0, keepdims=True),
                    jnp.sum(g * ap, axis=0, keepdims=True),
                    jnp.sum(g * ap_dm1, axis=0, keepdims=True),
                    jnp.sum(g * ap_dp1, axis=0, keepdims=True),
                    gsum * ap_max,
                ],
                axis=0,
            )
            dw_ref[0, i] = (dw * wlive).astype(dw_ref.dtype)

            # carry toward the previous sweep position.
            g_up = jnp.concatenate([g[1:], zero], axis=0)  # g(d+1)
            g_dn = jnp.concatenate([zero, g[:-1]], axis=0)  # g(d-1)
            eq = (ap == ap_max).astype(g.dtype)
            eq = eq / jnp.maximum(jnp.sum(eq, axis=0, keepdims=True), 1.0)
            c_next = w1 * g + w2 * g_up + w3 * g_dn + w4 * gsum * eq
            c_next = jnp.where(is_sweep_first, jnp.zeros_like(c_next), c_next)
            return jnp.where(in_range, c_next, c)

        carry_ref[:] = lax.fori_loop(0, Lb, step, carry_ref[:])

    return kernel


def _make_bwd_kernel_seeded(L_total: int, Lb: int, nlb: int, reverse: bool):
    """Backward of the seeded sweep.  Differences vs _make_bwd_kernel:
    the first-in-sweep-order step's specials (dx = g, dw = 0, carry cut)
    apply only when the seed was INVALID (reference boundary condition);
    with a valid seed every step is a full recurrence step, aprev at the
    first step is the seed itself (prepared by the caller), and the carry
    that falls out of the last processed step is exactly dL/dseed —
    emitted as a third output."""

    def kernel(
        x_ref, w_ref, aprev_ref, gbar_ref, valid_ref,
        dx_ref, dw_ref, dseed_ref, carry_ref,
    ):
        lb = pl.program_id(2)
        block_index = lb if reverse else (nlb - 1 - lb)
        valid = valid_ref[0, 0] != 0.0

        @pl.when(lb == 0)
        def _():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        def step(j, c):
            i = j if reverse else (Lb - 1 - j)
            l_global = block_index * Lb + i
            in_range = l_global < L_total
            is_sweep_first = l_global == (L_total - 1 if reverse else 0)
            ref_first = jnp.logical_and(is_sweep_first, jnp.logical_not(valid))
            live = jnp.where(in_range, 1.0, 0.0)

            f32 = jnp.float32
            xt = x_ref[0, i].astype(f32)
            ap = aprev_ref[0, i].astype(f32)
            gb = gbar_ref[0, i].astype(f32) * live
            wt = w_ref[0, i].astype(f32) * live
            w0, w1, w2, w3, w4 = (wt[k][None, :] for k in range(5))

            g = gb + c

            dx = jnp.where(ref_first, g, w0 * g)
            dx_ref[0, i] = dx.astype(dx_ref.dtype)

            wlive = live * jnp.where(ref_first, 0.0, 1.0)
            zero = jnp.zeros((1, g.shape[1]), g.dtype)
            ap_dm1 = jnp.concatenate([zero, ap[:-1]], axis=0)
            ap_dp1 = jnp.concatenate([ap[1:], zero], axis=0)
            ap_max = jnp.max(ap, axis=0, keepdims=True)
            gsum = jnp.sum(g, axis=0, keepdims=True)
            dw = jnp.concatenate(
                [
                    jnp.sum(g * xt, axis=0, keepdims=True),
                    jnp.sum(g * ap, axis=0, keepdims=True),
                    jnp.sum(g * ap_dm1, axis=0, keepdims=True),
                    jnp.sum(g * ap_dp1, axis=0, keepdims=True),
                    gsum * ap_max,
                ],
                axis=0,
            )
            dw_ref[0, i] = (dw * wlive).astype(dw_ref.dtype)

            g_up = jnp.concatenate([g[1:], zero], axis=0)
            g_dn = jnp.concatenate([zero, g[:-1]], axis=0)
            eq = (ap == ap_max).astype(g.dtype)
            eq = eq / jnp.maximum(jnp.sum(eq, axis=0, keepdims=True), 1.0)
            c_next = w1 * g + w2 * g_up + w3 * g_dn + w4 * gsum * eq
            c_next = jnp.where(ref_first, jnp.zeros_like(c_next), c_next)
            return jnp.where(in_range, c_next, c)

        carry_ref[:] = lax.fori_loop(0, Lb, step, carry_ref[:])

        # After the final block the carry is the cotangent flowing past the
        # sweep-first step — i.e. into the seed (zero when the seed was
        # invalid: ref_first cut it above).
        @pl.when(lb == nlb - 1)
        def _():
            dseed_ref[0] = carry_ref[:].astype(dseed_ref.dtype)

    return kernel


def _sweep_bwd_canonical_seeded(
    x, w, a, seed, valid, gbar, reverse: bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    N, L, D, M = x.shape
    Lb = _pick_l_block(D, L, 512 * 1024)
    nlb = pl.cdiv(L, Lb)
    grid = (N, pl.cdiv(M, _LANES), nlb)
    # aprev: seed at the sweep-first position (vs zeros in the unseeded
    # kernel, where that position's values are never used).
    if reverse:
        aprev = jnp.concatenate([a[:, 1:], seed[:, None]], axis=1)
        lmap = lambda n, m, l: (n, l, 0, m)
    else:
        aprev = jnp.concatenate([seed[:, None], a[:, :-1]], axis=1)
        lmap = lambda n, m, l: (n, nlb - 1 - l, 0, m)
    smap = lambda n, m, l: (n, 0, m)

    dx, dw, dseed = pl.pallas_call(
        _make_bwd_kernel_seeded(L, Lb, nlb, reverse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Lb, D, _LANES), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lb, 5, _LANES), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lb, D, _LANES), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lb, D, _LANES), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1), lambda n, m, l: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, Lb, D, _LANES), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lb, 5, _LANES), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, _LANES), smap, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, L, D, M), x.dtype),
            jax.ShapeDtypeStruct((N, L, 5, M), w.dtype),
            jax.ShapeDtypeStruct((N, D, M), seed.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((D, _LANES), jnp.float32)],
        interpret=_interpret(),
    )(x, w, aprev, gbar, valid)
    return dx, dw, dseed


def _sweep_bwd_canonical(
    x: jnp.ndarray,
    w: jnp.ndarray,
    a: jnp.ndarray,
    gbar: jnp.ndarray,
    reverse: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    N, L, D, M = x.shape
    Lb = _pick_l_block(D, L, 512 * 1024)
    nlb = pl.cdiv(L, Lb)
    grid = (N, pl.cdiv(M, _LANES), nlb)
    # A at the previous sweep position, block-local: shift +1 in L for a
    # forward sweep (A[l-1]), -1 for a reverse sweep (A[l+1]).
    if reverse:
        aprev = jnp.pad(a[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
        lmap = lambda n, m, l: (n, l, 0, m)
    else:
        aprev = jnp.pad(a[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
        lmap = lambda n, m, l: (n, nlb - 1 - l, 0, m)

    dx, dw = pl.pallas_call(
        _make_bwd_kernel(L, Lb, nlb, reverse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Lb, D, _LANES), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lb, 5, _LANES), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lb, D, _LANES), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lb, D, _LANES), lmap, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Lb, D, _LANES), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lb, 5, _LANES), lmap, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, L, D, M), x.dtype),
            jax.ShapeDtypeStruct((N, L, 5, M), w.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((D, _LANES), jnp.float32)],
        interpret=_interpret(),
    )(x, w, aprev, gbar)
    return dx, dw


# ---------------------------------------------------------------------------
# canonicalization + custom VJP + public API
# ---------------------------------------------------------------------------


def _x_to_canonical(x, axis):
    """(B,D,H,W,C) -> (N,L,D,M); no flips (reverse handling lives inside
    the kernels)."""
    B, D, H, W, C = x.shape
    if axis == "w":  # sweep along W; lanes = H
        return jnp.transpose(x, (0, 4, 3, 1, 2)).reshape(B * C, W, D, H)
    # sweep along H; lanes = W
    return jnp.transpose(x, (0, 4, 2, 1, 3)).reshape(B * C, H, D, W)


def _w_to_canonical(w, axis):
    """(B,H,W,C,5) -> (N,L,5,M)."""
    B, H, W, C, _ = w.shape
    if axis == "w":
        return jnp.transpose(w, (0, 3, 2, 4, 1)).reshape(B * C, W, 5, H)
    return jnp.transpose(w, (0, 3, 1, 4, 2)).reshape(B * C, H, 5, W)


def _to_canonical(x, w, axis):
    return _x_to_canonical(x, axis), _w_to_canonical(w, axis)


def _from_canonical(out, shape, axis):
    B, D, H, W, C = shape
    if axis == "w":
        out = out.reshape(B, C, W, D, H)
        return jnp.transpose(out, (0, 3, 4, 2, 1))
    out = out.reshape(B, C, H, D, W)
    return jnp.transpose(out, (0, 3, 2, 4, 1))


# The custom-VJP boundary sits at the canonical layout so the expensive
# (N,L,D,M) transposes around the kernels are ordinary jnp ops: autodiff
# transposes gradients back automatically, and the public `sga` shares ONE
# canonicalization between the two directions of each axis instead of
# paying transpose traffic per direction.


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _sweep_canonical(xk, wk, reverse: bool):
    return _sweep_fwd_canonical(xk, wk, reverse)


def _sweep_canonical_fwd(xk, wk, reverse):
    a = _sweep_fwd_canonical(xk, wk, reverse)
    return a, (xk, wk, a)


def _sweep_canonical_bwd(reverse, res, gbar):
    xk, wk, a = res
    return _sweep_bwd_canonical(xk, wk, a, gbar, reverse)


_sweep_canonical.defvjp(_sweep_canonical_fwd, _sweep_canonical_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _sweep_canonical_seeded(xk, wk, seed, valid, reverse: bool):
    return _sweep_fwd_canonical_seeded(xk, wk, seed, valid, reverse)


def _sweep_canonical_seeded_fwd(xk, wk, seed, valid, reverse):
    a = _sweep_fwd_canonical_seeded(xk, wk, seed, valid, reverse)
    return a, (xk, wk, a, seed, valid)


def _sweep_canonical_seeded_bwd(reverse, res, gbar):
    xk, wk, a, seed, valid = res
    dx, dw, dseed = _sweep_bwd_canonical_seeded(
        xk, wk, a, seed, valid, gbar, reverse
    )
    return dx, dw, dseed, jnp.zeros_like(valid)


_sweep_canonical_seeded.defvjp(
    _sweep_canonical_seeded_fwd, _sweep_canonical_seeded_bwd
)


def sga_sweep(x, w, axis: str, reverse: bool, initial=None, initial_valid=None):
    """Pallas directional sweep; same contract as ops.sga.sga_sweep,
    including the seeded boundary condition used by the cross-shard
    wavefront pipeline (initial: (B, D, P, C) carry entering the sweep,
    initial_valid: traced bool selecting seed vs reference condition)."""
    xk, wk = _to_canonical(x, w, axis)
    if initial is None:
        out = _sweep_canonical(xk, wk, reverse)
        return _from_canonical(out, x.shape, axis)
    B, D, H, W, C = x.shape
    # seed (B, D, P, C) -> canonical (N, D, M): N = B*C, M = perpendicular.
    seedk = jnp.transpose(initial, (0, 3, 1, 2)).reshape(B * C, D, -1)
    if initial_valid is None:
        valid = jnp.ones((1, 1), jnp.float32)
    else:
        valid = jnp.asarray(initial_valid, jnp.float32).reshape(1, 1)
    out = _sweep_canonical_seeded(xk, wk, seedk, valid, reverse)
    return _from_canonical(out, x.shape, axis)


def sga(x: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Full SGA (max over four directional Pallas sweeps); same contract as
    ops.sga.sga.  The volume is canonicalized once per axis (not per
    direction), the direction pair is max-fused in canonical space, and the
    cross-axis max happens in the "h" canonical layout — one layout
    transform + fused max instead of two transforms and a separate
    full-volume max pass."""
    if weights.shape[-2:] != (4, 5):
        raise ValueError(f"weights must end in (4, 5), got {weights.shape}")
    per_axis = []
    for axis, (d_fwd, d_rev) in (("w", (0, 1)), ("h", (2, 3))):
        xk = _x_to_canonical(x, axis)
        a_fwd = _sweep_canonical(
            xk, _w_to_canonical(weights[..., d_fwd, :], axis), False
        )
        a_rev = _sweep_canonical(
            xk, _w_to_canonical(weights[..., d_rev, :], axis), True
        )
        per_axis.append(jnp.maximum(a_fwd, a_rev))
    # w-canonical (N, W, D, H) -> h-canonical (N, H, D, W).
    a_wh = jnp.transpose(per_axis[0], (0, 3, 2, 1))
    return _from_canonical(jnp.maximum(a_wh, per_axis[1]), x.shape, "h")
