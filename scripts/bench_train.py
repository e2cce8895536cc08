#!/usr/bin/env python
"""Training-step benchmark on the real chip: ms/step, pairs/s, peak HBM.

The reference's product is its trainer (train.py epoch loop, SURVEY.md
§3.1; trained at batch 16 across 8x32GB GPUs, i.e. 2 pairs/GPU at the
240x528 crop).  This harness compiles and times the FULL jitted train step
— forward + Pallas backward kernels + Adam — for GANet-deep at the
reference training crop, probes batch sizes until OOM, and reports
per-step latency plus compiler-reported HBM (and runtime memory_stats
where the backend exposes them).

  python scripts/bench_train.py                       # 240x528 D=192 probe
  python scripts/bench_train.py --batches 2 --remat sga
  python scripts/bench_train.py --json TRAIN_BENCH_r03.json

Timing uses step-chaining (state_{n+1} = step(state_n)) with a final loss
readback, measured at two chain lengths so per-step time is the slope —
robust to the axon relay's async dispatch (see utils/profiling.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ganet_tpu.utils.platform import apply_platform_overrides, enable_compile_cache


def human(n):
    return f"{n / 2**30:.2f} GiB" if n is not None else "n/a"


def bench_one(model, H, W, D, dtype, batch, remat, lr, steps, impl="auto"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ganet_tpu.config import (
        DataConfig,
        MeshConfig,
        OptimConfig,
        TrainConfig,
        model_config,
    )
    from ganet_tpu.parallel.mesh import make_mesh, shard_batch
    from ganet_tpu.train.state import create_train_state
    from ganet_tpu.train.trainer import make_train_step

    cfg = TrainConfig(
        model=model_config(
            model, max_disp=D, compute_dtype=dtype, remat=remat, sga_impl=impl
        ),
        data=DataConfig(crop_height=H, crop_width=W, kind="synthetic"),
        optim=OptimConfig(lr=lr),
        mesh=MeshConfig(),
        batch_size=batch,
        save_path="/tmp/bench_train",
    )
    mesh = make_mesh(cfg.mesh)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    disp = jax.random.uniform(ks[2], (batch, H, W), jnp.float32, 1.0, D - 1)
    batch_data = {
        "left": jax.random.normal(ks[0], (batch, H, W, 3), jnp.float32),
        "right": jax.random.normal(ks[1], (batch, H, W, 3), jnp.float32),
        "disparity": disp,
        "valid": jnp.ones((batch, H, W), jnp.float32),
    }
    batch_data = {k: np.asarray(v) for k, v in batch_data.items()}

    t0 = time.time()
    with mesh:
        state = create_train_state(cfg, key, mesh=mesh)
    jax.block_until_ready(state.params)
    init_s = time.time() - t0
    step_fn = make_train_step(cfg, mesh)
    sharded = shard_batch(mesh, batch_data)

    # Compiler-reported memory (works even where runtime stats don't):
    mem = {}
    try:
        comp = step_fn.lower(state, sharded).compile()
        ma = comp.memory_analysis()
        if ma is not None:
            mem = {
                "argument_bytes": int(ma.argument_size_in_bytes),
                "output_bytes": int(ma.output_size_in_bytes),
                "temp_bytes": int(ma.temp_size_in_bytes),
                "total_bytes": int(
                    ma.argument_size_in_bytes
                    + ma.output_size_in_bytes
                    + ma.temp_size_in_bytes
                ),
            }
    except Exception as e:  # lower/compile path varies by jax version
        mem = {"error": f"{type(e).__name__}: {e}"}

    def run_chain(state, n):
        m = None
        for _ in range(n):
            state, m = step_fn(state, sharded)
        return state, float(m["loss"])

    t0 = time.time()
    state, loss0 = run_chain(state, 1)  # compile + warmup
    compile_s = time.time() - t0

    times = {}
    loss = loss0
    for _ in range(2):  # min over reps: robust to dispatch jitter
        for n in (1, 1 + steps):
            t0 = time.time()
            state, loss = run_chain(state, n)
            dt = time.time() - t0
            times[n] = min(times.get(n, float("inf")), dt)
    sec_per_step = max((times[1 + steps] - times[1]) / steps, 1e-9)

    rt_mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            rt_mem = {
                k: int(v)
                for k, v in stats.items()
                if "bytes" in k or "size" in k
            }
    except Exception:
        pass

    assert np.isfinite(loss), f"non-finite loss {loss}"
    return {
        "model": model,
        "shape": f"{H}x{W}",
        "max_disp": D,
        "dtype": dtype,
        "batch": batch,
        "remat": remat,
        "impl": impl,
        "ms_per_step": round(sec_per_step * 1e3, 1),
        "pairs_per_s": round(batch / sec_per_step, 3),
        "loss": round(loss, 4),
        "init_s": round(init_s, 1),
        "compile_s": round(compile_s, 1),
        "compiler_memory": mem,
        "runtime_memory": rt_mem,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="GANet_deep")
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=528)
    p.add_argument("--max_disp", type=int, default=192)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--batches", default="1,2,4,8", help="comma list to probe")
    p.add_argument("--remat", default="none", help="none | sga | full")
    p.add_argument("--impl", default="auto", help="auto | scan | pallas")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--steps", type=int, default=4, help="timed chain length")
    p.add_argument("--json", default="", help="append results to this file")
    args = p.parse_args(argv)

    apply_platform_overrides()
    enable_compile_cache()
    import jax

    print(
        f"# backend={jax.default_backend()} devices={jax.devices()}",
        file=sys.stderr,
    )
    # Device HBM limit for failure diagnosis (v5e: 16 GiB).  memory_stats
    # is absent on some backends (the axon relay) — fall back to the known
    # capacity of the attached chip family.
    hbm_limit = None
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        hbm_limit = stats.get("bytes_limit")
    except Exception:
        pass
    if not hbm_limit and "v5" in str(jax.local_devices()[0]).lower():
        hbm_limit = 16 * 2**30

    results = []
    ok_mem = []  # (batch, compiler total_bytes) of successes, for diagnosis
    for b in [int(x) for x in args.batches.split(",") if x]:
        try:
            r = bench_one(
                args.model,
                args.height,
                args.width,
                args.max_disp,
                args.dtype,
                b,
                args.remat,
                args.lr,
                args.steps,
                impl=args.impl,
            )
            total = r.get("compiler_memory", {}).get("total_bytes")
            if total:
                ok_mem.append((b, total))
        except Exception as e:
            # One diagnostic line, not a log dump (VERDICT r4 #6): the relay
            # wraps compiler failures in opaque HTTP 500s, so diagnose by
            # extrapolating the compiler's own memory estimates from the
            # configs that DID compile at this remat policy.
            head = " ".join(str(e).split())[:300]
            est = None
            # Fit through the two largest successful batches (sorted —
            # --batches need not be ascending; a descending or repeated
            # list would otherwise yield a garbage/negative slope).
            pts = sorted(set(ok_mem))
            if len(pts) >= 2 and pts[-1][0] != pts[-2][0]:
                (b0, m0), (b1, m1) = pts[-2], pts[-1]
                est = m1 + (m1 - m0) * (b - b1) / (b1 - b0)
            elif pts:
                est = pts[-1][1] * b / pts[-1][0]
            basis = (
                f"(extrapolated from the compiler's own estimates at "
                f"batches {[x[0] for x in ok_mem]})"
            )
            if est and hbm_limit and est > hbm_limit:
                reason = (
                    f"HBM-infeasible: extrapolated compiler memory "
                    f"≈{est / 2**30:.1f} GiB > {hbm_limit / 2**30:.0f} GiB "
                    f"device limit {basis}"
                )
            elif est and hbm_limit and est > 0.95 * hbm_limit:
                reason = (
                    f"HBM-infeasible at the boundary: extrapolated "
                    f"≈{est / 2**30:.1f} GiB vs the {hbm_limit / 2**30:.0f} "
                    f"GiB limit — over it once runtime reserves are "
                    f"included {basis}"
                )
            elif est and hbm_limit:
                reason = (
                    f"compile failed well below the HBM limit (extrapolated "
                    f"≈{est / 2**30:.1f} GiB of {hbm_limit / 2**30:.0f} GiB)"
                    " — compiler/relay fault, not memory"
                )
            elif est:
                # Unknown HBM capacity: report the estimate without
                # asserting a fault class (an inverted 'not memory' call
                # on an unrecognized chip would mislead).
                reason = (
                    f"compile failed; extrapolated compiler memory "
                    f"≈{est / 2**30:.1f} GiB, device HBM limit unknown on "
                    "this backend"
                )
            else:
                reason = "compile failed with no smaller-batch estimate to extrapolate from"
            r = {
                "model": args.model,
                "shape": f"{args.height}x{args.width}",
                "batch": b,
                "remat": args.remat,
                "reason": reason,
                "estimated_total_bytes": int(est) if est else None,
                "hbm_limit_bytes": int(hbm_limit) if hbm_limit else None,
                "error_head": f"{type(e).__name__}: {head}",
            }
        results.append(r)
        print(json.dumps(r), flush=True)
        if "reason" in r:
            break  # larger batches will OOM too
    if args.json:
        with open(args.json, "a") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
