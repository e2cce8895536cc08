#!/usr/bin/env python
"""Training-step stage breakdown: forward / backward / optimizer split and
the remat policy's recompute tax (VERDICT r3 #3 — training had only
end-to-end ms/step; nothing said where the time goes).

Measures, at the reference crop on the real chip:
  fwd_train      jitted forward in train mode (BN batch stats, 3 heads)
  fwd_bwd        value_and_grad of the training loss (no optimizer)
  full_step      the production train step (fwd + bwd + Adam + BN update)
Differences give backward-attributable and optimizer-attributable time.
Run with --remat none|sga|full to quantify each policy's recompute tax
(the bwd-attributable delta vs remat=none at the same batch).

  python scripts/profile_train.py --batch 1 --remat none
  python scripts/profile_train.py --batch 4 --remat full
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ganet_tpu.utils.platform import apply_platform_overrides, enable_compile_cache


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="GANet_deep")
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=528)
    p.add_argument("--max_disp", type=int, default=192)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--remat", default="full")
    args = p.parse_args(argv)

    apply_platform_overrides()
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from ganet_tpu.config import (
        DataConfig,
        MeshConfig,
        OptimConfig,
        TrainConfig,
        model_config,
    )
    from ganet_tpu.models import GANet
    from ganet_tpu.parallel.mesh import make_mesh, shard_batch
    from ganet_tpu.train.loss import deep_supervision_loss
    from ganet_tpu.train.state import create_train_state
    from ganet_tpu.train.trainer import make_train_step
    from ganet_tpu.utils.profiling import benchmark_fn_chained

    H, W, D, B = args.height, args.width, args.max_disp, args.batch
    cfg = TrainConfig(
        model=model_config(
            args.model, max_disp=D, compute_dtype=args.dtype, remat=args.remat
        ),
        data=DataConfig(crop_height=H, crop_width=W, kind="synthetic"),
        optim=OptimConfig(),
        mesh=MeshConfig(),
        batch_size=B,
        save_path="/tmp/profile_train",
    )
    mesh = make_mesh(cfg.mesh)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    batch = {
        "left": jax.random.normal(ks[0], (B, H, W, 3), jnp.float32),
        "right": jax.random.normal(ks[1], (B, H, W, 3), jnp.float32),
        "disparity": jax.random.uniform(ks[2], (B, H, W), jnp.float32, 1.0, D - 1),
        "valid": jnp.ones((B, H, W), jnp.float32),
    }
    batch = shard_batch(mesh, {k: jax.device_get(v) for k, v in batch.items()})
    with mesh:
        state = create_train_state(cfg, key, mesh=mesh)
    model = GANet(cfg.model)

    def loss_fn(params, batch_stats, left, right, disp, valid):
        outputs, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            left, right, train=True, mutable=["batch_stats"],
        )
        return deep_supervision_loss(outputs, disp, valid, cfg.loss_weights)

    results = {"batch": B, "remat": args.remat, "shape": f"{H}x{W}",
               "dtype": args.dtype}

    def fwd(left, params, bs, right):
        return loss_fn(params, bs, left, right, batch["disparity"], batch["valid"])

    sec = benchmark_fn_chained(
        fwd, batch["left"], state.params, state.batch_stats, batch["right"],
        iters_low=2, iters_high=4,
    )
    results["fwd_train_ms"] = round(sec * 1e3, 1)

    def fwd_bwd(left, params, bs, right):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, bs, left, right, batch["disparity"], batch["valid"])
        )(params)
        return loss, grads

    sec = benchmark_fn_chained(
        fwd_bwd, batch["left"], state.params, state.batch_stats, batch["right"],
        iters_low=2, iters_high=4,
    )
    results["fwd_bwd_ms"] = round(sec * 1e3, 1)

    step_fn = make_train_step(cfg, mesh)

    # chain full steps (state evolves; slope over chain lengths)
    import time

    def run_chain(s, n):
        m = None
        for _ in range(n):
            s, m = step_fn(s, batch)
        return s, float(m["loss"])

    state2, _ = run_chain(state, 1)  # compile
    times = {}
    for _ in range(2):
        for n in (1, 5):
            t0 = time.perf_counter()
            state2, _ = run_chain(state2, n)
            dt = time.perf_counter() - t0
            times[n] = min(times.get(n, float("inf")), dt)
    results["full_step_ms"] = round(max((times[5] - times[1]) / 4, 1e-9) * 1e3, 1)

    results["bwd_attrib_ms"] = round(
        results["fwd_bwd_ms"] - results["fwd_train_ms"], 1
    )
    results["optimizer_attrib_ms"] = round(
        results["full_step_ms"] - results["fwd_bwd_ms"], 1
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
