#!/usr/bin/env python
"""Benchmark: stereo pairs/sec/chip, GANet-deep inference at 576x960.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference GANet-deep runs ~1.8 s/pair at 1242x375 (0.466 MP)
on the KITTI leaderboard GPU (BASELINE.md).  Scaled to 576x960 (0.553 MP,
x1.19 pixels) that is ~2.13 s/pair => 0.47 pairs/s — the vs_baseline
denominator.

Flags:
  --quick     smaller model/size (smoke run)
  --model     GANet_deep (default) | GANet11 | GANet_small
  --height/--width/--max_disp/--batch  override the benchmark config
  --dtype     bfloat16 (default) | float32
  --impl      auto | scan | pallas

The default batch is 4: pairs/s/chip is a THROUGHPUT metric and batching
amortizes per-kernel fixed costs that dominate at batch 1 on this model
(measured r5: 2.43 pairs/s at batch 1, 3.73 at batch 4, 3.61 at batch 6).
Use --batch 1 for single-pair latency.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

BASELINE_PAIRS_PER_S = 0.47


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--model", default="GANet_deep")
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--max_disp", type=int, default=192)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument(
        "--head_dtype",
        default="",
        help="full-res disparity-head volume dtype (default: follow the "
        "accuracy-gated ModelConfig default)",
    )
    p.add_argument("--impl", default="auto")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)

    if args.quick:
        args.model, args.height, args.width, args.max_disp = (
            "GANet_small", 96, 192, 24,
        )

    from ganet_tpu.utils.platform import apply_platform_overrides, enable_compile_cache

    apply_platform_overrides()
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from ganet_tpu.config import model_config
    from ganet_tpu.models import GANet
    from ganet_tpu.utils.profiling import benchmark_fn_chained, drift_probe_ms

    cfg = model_config(
        args.model,
        max_disp=args.max_disp,
        compute_dtype=args.dtype,
        sga_impl=args.impl,
        **({"head_dtype": args.head_dtype} if args.head_dtype else {}),
    )
    model = GANet(cfg)
    B, H, W = args.batch, args.height, args.width
    key = jax.random.PRNGKey(0)
    left = jax.random.normal(key, (B, H, W, 3), jnp.float32)
    right = jax.random.normal(key, (B, H, W, 3), jnp.float32)

    t0 = time.time()
    variables = jax.jit(lambda k: model.init(k, left, right, train=True))(key)
    jax.block_until_ready(variables)
    init_s = time.time() - t0

    fwd = jax.jit(lambda v, l, r: model.apply(v, l, r, train=False))
    t0 = time.time()
    jax.block_until_ready(fwd(variables, left, right))
    compile_s = time.time() - t0

    # Chained timing: robust to async/remote runtimes where
    # block_until_ready returns before execution (see profiling.py).
    def run(l, v, r):
        return model.apply(v, l, r, train=False)

    sec_per_call = benchmark_fn_chained(
        run, left, variables, right,
        iters_low=1, iters_high=max(3, args.iters // 2),
    )
    pairs_per_s = B / sec_per_call

    # Pinned fixed-shape probe: quantifies chip-state drift between runs
    # (VERDICT r4 #1a).  Expected ~constant across sessions; if the model
    # latency moves but the probe doesn't, the change is real.  TPU-only:
    # on a CPU backend there is no chip state to pin, and the 2.2-TFLOP
    # bf16 chains would take minutes of emulated compute.
    probe_ms = (
        drift_probe_ms()
        if jax.default_backend() in ("tpu", "axon")
        else None
    )

    print(
        f"# model={cfg.name} {H}x{W} D={cfg.max_disp} batch={B} "
        f"dtype={args.dtype} impl={args.impl} backend={jax.default_backend()} "
        f"init={init_s:.1f}s compile={compile_s:.1f}s "
        f"latency={sec_per_call * 1e3:.1f}ms"
        + (f" probe={probe_ms:.2f}ms" if probe_ms is not None else ""),
        file=sys.stderr,
    )
    payload = {
        "metric": f"stereo_pairs_per_sec_per_chip_{H}x{W}_{cfg.name}",
        "value": round(pairs_per_s, 4),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 3),
        "probe_ms": round(probe_ms, 2) if probe_ms is not None else None,
    }
    if B > 1 and not args.quick:
        # Latency-vs-latency companion (VERDICT r3 #6): the headline is a
        # batch-B throughput metric; carry the single-pair number in the
        # same artifact so vs_baseline has an apples-to-apples reading
        # against the reference's (batch-1) leaderboard runtime.
        sec_b1 = benchmark_fn_chained(
            run, left[:1], variables, right[:1],
            iters_low=1, iters_high=max(3, args.iters // 2),
        )
        payload["batch"] = B
        payload["batch1_latency_ms"] = round(sec_b1 * 1e3, 1)
        payload["batch1_pairs_per_s"] = round(1.0 / sec_b1, 4)
        payload["batch1_vs_baseline"] = round(
            1.0 / sec_b1 / BASELINE_PAIRS_PER_S, 3
        )
        print(
            f"# batch1 latency={sec_b1 * 1e3:.1f}ms "
            f"pairs/s={1.0 / sec_b1:.3f}",
            file=sys.stderr,
        )
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
