#!/usr/bin/env python
"""Compiled-kernel smoke test on the real TPU chip (VERDICT round-1 #4).

The CI suite runs the Pallas kernels in interpreter mode on CPU; this
script runs the COMPILED Mosaic kernels on the actual chip and checks
forward + VJP parity against the lax.scan/stencil oracles at a
production-like (but quick) shape, in float32 and bfloat16.

Exits nonzero on drift.  Run every round:  python scripts/tpu_smoke.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ganet_tpu.utils.platform import apply_platform_overrides, enable_compile_cache


def main() -> int:
    apply_platform_overrides()
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    # NOTE: ops/__init__ re-exports `sga`/`lga` as functions, shadowing the
    # submodule attributes — import the scan oracles by their symbols.
    from ganet_tpu.ops.sga import sga as sga_scan
    from ganet_tpu.ops import l1_normalize
    from ganet_tpu.ops import lga as lga_scan
    from ganet_tpu.ops import lga_pallas, sga_pallas

    if jax.default_backend() not in ("tpu", "axon"):
        print(f"SKIP: backend is {jax.default_backend()}, not a TPU")
        return 0

    failures = []

    def check(name, got, want, tol):
        got = np.asarray(got, np.float32)
        want = np.asarray(want, np.float32)
        denom = np.maximum(np.abs(want), 1.0)
        err = float(np.max(np.abs(got - want) / denom))
        ok = err <= tol
        print(f"{name:48s} max_rel_err={err:.3e}  {'ok' if ok else 'FAIL'}")
        if not ok:
            failures.append(name)

    def check_stat(name, got, want, p99_tol, frac_tol):
        """Statistical gate for bf16 gradients THROUGH the max-recurrence:
        near-ties in max_d' route the gradient to a different disparity at
        bf16 than at f32 (verified: the pure lax.scan oracle at bf16 shows
        the same sparse large-error profile), so elementwise max-error is
        ill-posed; gate the p99 relative error and the outlier fraction."""
        got = np.asarray(got, np.float32)
        want = np.asarray(want, np.float32)
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1.0)
        p99 = float(np.quantile(rel, 0.99))
        frac = float((rel > 0.1).mean())
        ok = p99 <= p99_tol and frac <= frac_tol
        print(
            f"{name:48s} p99_rel={p99:.3e} frac>0.1={frac:.3%}"
            f"  {'ok' if ok else 'FAIL'}"
        )
        if not ok:
            failures.append(name)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)

    # --- SGA: production-like 1/3-res block, reduced H/W for speed -------
    B, D, H, W, C = 1, 64, 96, 160, 8
    for dtype, tol_f, tol_g in ((jnp.float32, 2e-5, 2e-4), (jnp.bfloat16, 2e-2, 5e-2)):
        dt = jnp.dtype(dtype).name
        x = jax.random.normal(ks[0], (B, D, H, W, C), dtype)
        w = l1_normalize(
            jax.random.uniform(ks[1], (B, H, W, C, 4, 5), jnp.float32) + 0.1,
            axis=-1,
        ).astype(dtype)
        want = jax.jit(sga_scan)(
            x.astype(jnp.float32), w.astype(jnp.float32)
        )
        got = jax.jit(sga_pallas.sga)(x, w)
        check(f"sga_fwd[{dt}]", got, want, tol_f)

        def loss_p(a, b):
            return jnp.sum(sga_pallas.sga(a, b).astype(jnp.float32) ** 2)

        def loss_s(a, b):
            return jnp.sum(sga_scan(a, b) ** 2)

        gp = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(x, w)
        gs = jax.jit(jax.grad(loss_s, argnums=(0, 1)))(
            x.astype(jnp.float32), w.astype(jnp.float32)
        )
        if dtype == jnp.bfloat16:
            # Semantics drift vs the f32 oracle is dominated by bf16
            # max-tie routing (inherent — the bf16 scan oracle shows the
            # same profile).  Gates are the round-2 measured envelope
            # (p99 0.20 / frac 2.2%) with ~25-80% headroom so a GRADUAL
            # compiled-kernel regression trips them (VERDICT r2 weak #3);
            # a gross bug (wrong index/shift) pushes frac>0.1 past 50%.
            check_stat(f"sga_vjp_dx[{dt}] (vs f32 oracle)", gp[0], gs[0], 0.25, 0.03)
            check_stat(f"sga_vjp_dw[{dt}] (vs f32 oracle)", gp[1], gs[1], 0.25, 0.04)
            # (A compiled-vs-interpret cross-check was tried and dropped:
            # interpret-mode pallas through this box's remote-compile relay
            # exceeds any reasonable smoke budget even at reduced shapes.
            # A gross compiled-kernel bug — wrong index, wrong shift —
            # pushes frac>0.1 above 50%, far past the gates above.)
        else:
            check(f"sga_vjp_dx[{dt}]", gp[0], gs[0], tol_g)
            check(f"sga_vjp_dw[{dt}]", gp[1], gs[1], tol_g)

    # --- seeded sweeps: the wavefront pipeline's local unit of work ------
    # (the newest kernels — boundary carry in VMEM, dL/dseed VJP — were
    # absent from the round-2 on-chip gate; VERDICT r2 #6)
    from ganet_tpu.ops.sga import sga_sweep as sweep_scan

    B, D, H, W, C = 1, 32, 48, 128, 8
    x = jax.random.normal(ks[0], (B, D, H, W, C), jnp.float32)
    w = l1_normalize(
        jax.random.uniform(ks[1], (B, H, W, C, 5), jnp.float32) + 0.1,
        axis=-1,
    )
    seed = jax.random.normal(ks[2], (B, D, W, C), jnp.float32)
    for reverse in (False, True):
        tag = "rev" if reverse else "fwd"
        want = jax.jit(
            lambda a, b, s: sweep_scan(
                a, b, "h", reverse, initial=s, initial_valid=True
            )
        )(x, w, seed)
        got = jax.jit(
            lambda a, b, s: sga_pallas.sga_sweep(
                a, b, "h", reverse, initial=s, initial_valid=True
            )
        )(x, w, seed)
        check(f"sga_seeded_{tag}[float32]", got, want, 2e-5)

        def loss_sp(a, b, s):
            return jnp.sum(
                sga_pallas.sga_sweep(
                    a, b, "h", reverse, initial=s, initial_valid=True
                )
                ** 2
            )

        def loss_ss(a, b, s):
            return jnp.sum(
                sweep_scan(a, b, "h", reverse, initial=s, initial_valid=True)
                ** 2
            )

        gp = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(x, w, seed)
        gs = jax.jit(jax.grad(loss_ss, argnums=(0, 1, 2)))(x, w, seed)
        check(f"sga_seeded_{tag}_vjp_dx[float32]", gp[0], gs[0], 2e-4)
        check(f"sga_seeded_{tag}_vjp_dw[float32]", gp[1], gs[1], 2e-4)
        check(f"sga_seeded_{tag}_vjp_dseed[float32]", gp[2], gs[2], 2e-4)

    # --- LGA: full-res head filtering, reduced size -----------------------
    B, D, H, W = 1, 48, 96, 256
    for dtype, tol_f, tol_g in ((jnp.float32, 2e-5, 2e-4), (jnp.bfloat16, 2e-2, 5e-2)):
        dt = jnp.dtype(dtype).name
        x = jax.random.normal(ks[2], (B, D, H, W), dtype)
        g = l1_normalize(
            jax.random.uniform(ks[3], (B, H, W, 75), jnp.float32) + 0.1,
            axis=-1,
        ).astype(dtype)
        want = jax.jit(lambda a, b: lga_scan(a, b, radius=2, repeats=1))(
            x.astype(jnp.float32), g.astype(jnp.float32)
        )
        got = jax.jit(lambda a, b: lga_pallas.lga(a, b, radius=2, repeats=1))(x, g)
        check(f"lga_fwd[{dt}]", got, want, tol_f)

        def lossl_p(a, b):
            return jnp.sum(lga_pallas.lga(a, b, radius=2).astype(jnp.float32) ** 2)

        def lossl_s(a, b):
            return jnp.sum(lga_scan(a, b, radius=2) ** 2)

        gp = jax.jit(jax.grad(lossl_p, argnums=(0, 1)))(x, g)
        gs = jax.jit(jax.grad(lossl_s, argnums=(0, 1)))(
            x.astype(jnp.float32), g.astype(jnp.float32)
        )
        check(f"lga_vjp_dx[{dt}]", gp[0], gs[0], tol_g)
        check(f"lga_vjp_dg[{dt}]", gp[1], gs[1], tol_g)

    # --- bf16 head path (round-4 numerics: trilinear upsample -> LGA ->
    # softmax -> LGA -> fused renorm/expectation, volumes stored in
    # head_dtype, reductions in f32) — gate the END disparity map in
    # PIXELS against the all-f32 head (VERDICT r4 #5: these numerics
    # shipped in r4 with no on-chip gate).
    from ganet_tpu.ops import dispatch
    from ganet_tpu.ops.disparity import trilinear_upsample

    def head_pipeline(vol3, lg1, lg2, hd):
        D = vol3.shape[1] * 3
        H, W = vol3.shape[2] * 3, vol3.shape[3] * 3
        x2 = trilinear_upsample(vol3.astype(hd), (D, H, W))
        g1 = l1_normalize(lg1.astype(jnp.float32), axis=-1).astype(hd)
        g2 = l1_normalize(lg2.astype(jnp.float32), axis=-1).astype(hd)
        x2 = dispatch.lga(x2, g1, radius=2, repeats=1, impl="pallas")
        p = jnp.exp(jax.nn.log_softmax(-x2.astype(jnp.float32), axis=1)).astype(hd)
        p = dispatch.lga(p, g2, radius=2, repeats=1, impl="pallas")
        pf = p.astype(jnp.float32)
        d_vals = jnp.arange(D, dtype=jnp.float32).reshape(1, D, 1, 1)
        num = jnp.sum(pf * d_vals, axis=1)
        den = jnp.maximum(jnp.sum(jnp.abs(pf), axis=1), 1e-6)
        return num / den

    B, D3, H3, W3 = 1, 16, 32, 80  # -> (48, 96, 240) full-res volume
    vol3 = 4.0 * jax.random.normal(ks[0], (B, D3, H3, W3), jnp.float32)
    lg1 = jax.random.uniform(ks[1], (B, H3 * 3, W3 * 3, 75), jnp.float32) + 0.1
    lg2 = jax.random.uniform(ks[3], (B, H3 * 3, W3 * 3, 75), jnp.float32) + 0.1
    want = jax.jit(lambda a, b, c: head_pipeline(a, b, c, jnp.float32))(
        vol3, lg1, lg2
    )
    got = jax.jit(lambda a, b, c: head_pipeline(a, b, c, jnp.bfloat16))(
        vol3, lg1, lg2
    )
    # Gate in disparity pixels: bf16 volume storage moves the regression
    # by well under 0.5 px away from softmax ties (accuracy-gated in
    # config.py: held-out EPE showed bf16 heads in-noise).
    err_px = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    p99 = float(np.quantile(err_px, 0.99))
    ok = p99 <= 0.5
    print(f"{'head_bf16_vs_f32 (p99 px)':48s} p99_err_px={p99:.3f}  {'ok' if ok else 'FAIL'}")
    if not ok:
        failures.append("head_bf16_vs_f32")

    if failures:
        print(f"\nFAILED: {len(failures)} check(s): {failures}")
        return 1
    print("\nall compiled-kernel checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
