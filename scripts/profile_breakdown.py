#!/usr/bin/env python
"""Component-level latency breakdown of GANet-deep inference on the TPU.

Times each stage of the pipeline (SURVEY.md §3.1 call stack) at the
flagship bench shapes (576x960, D=192) using the chained-loop harness
(ganet_tpu/utils/profiling.py) so remote-runtime dispatch overhead cancels.
Run on the real chip:  python scripts/profile_breakdown.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ganet_tpu.utils.platform import apply_platform_overrides, enable_compile_cache


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--max_disp", type=int, default=192)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--head_dtype", default="")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--only", default="", help="comma-separated stage filter")
    p.add_argument(
        "--trace",
        default="",
        metavar="DIR",
        help="also capture a Perfetto/XPlane trace of each stage's timed "
        "loop into DIR (open with xprof/tensorboard or ui.perfetto.dev)",
    )
    args = p.parse_args(argv)

    apply_platform_overrides()
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from ganet_tpu.ops import dispatch, l1_normalize
    from ganet_tpu.ops.cost_volume import build_cost_volume
    from ganet_tpu.ops.disparity import disparity_regression, trilinear_upsample
    from ganet_tpu.utils.profiling import benchmark_fn_chained

    H, W, D = args.height, args.width, args.max_disp
    H3, W3, D3 = H // 3, W // 3, D // 3
    NB = args.batch
    dtype = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    stages = {}

    # --- SGA blocks (full + half res, deep config: 3 + 4 blocks) ---------
    C_full, C_half = 32, 48
    x_full = jax.random.normal(ks[0], (NB, D3, H3, W3, C_full), dtype)
    w_full = l1_normalize(
        jax.random.uniform(ks[1], (NB, H3, W3, C_full, 4, 5), jnp.float32),
        axis=-1,
    ).astype(dtype)
    # NOTE: every big tensor a stage needs rides as an explicit argument
    # (the *rest of benchmark_fn_chained), NOT a closure: closed-over arrays
    # embed as HLO constants and blow past the remote-compile relay's
    # request-size limit at these shapes (observed HTTP 413).
    stages["sga_full(x1)"] = (
        lambda x, w: dispatch.sga(x, w, impl="pallas"),
        x_full,
        w_full,
    )
    x_half = jax.random.normal(
        ks[2], (NB, D3 // 2, H3 // 2, W3 // 2, C_half), dtype
    )
    w_half = l1_normalize(
        jax.random.uniform(
            ks[3], (NB, H3 // 2, W3 // 2, C_half, 4, 5), jnp.float32
        ),
        axis=-1,
    ).astype(dtype)
    stages["sga_half(x1)"] = (
        lambda x, w: dispatch.sga(x, w, impl="pallas"),
        x_half,
        w_half,
    )

    # --- LGA at full image resolution (DispAgg head: 2 apps x 2 repeats) -
    x_lga = jax.random.normal(ks[4], (NB, D, H, W), jnp.float32)
    g_lga = l1_normalize(
        jax.random.uniform(ks[5], (NB, H, W, 75), jnp.float32), axis=-1
    )
    stages["lga_full(x1)"] = (
        lambda x, g: dispatch.lga(x, g, radius=2, repeats=1, impl="pallas"),
        x_lga,
        g_lga,
    )

    # --- trilinear upsample + softmax + regression (per head) ------------
    x_low = jax.random.normal(ks[6], (NB, D3, H3, W3), jnp.float32)

    def head(x):
        up = trilinear_upsample(x, (D, H, W))
        p = jax.nn.softmax(-up, axis=1)
        return disparity_regression(p, D)

    stages["disp_head(upsample+softmax+reg)"] = (head, x_low)

    # --- 3D conv (representative hourglass layer) -------------------------
    import flax.linen as nn

    from ganet_tpu.models.layers import FastConv3d

    conv = FastConv3d(C_full, 3, use_bias=False, dtype=dtype)
    cv0 = jax.random.normal(ks[7], (NB, D3, H3, W3, 2 * C_full), dtype)
    cvars = conv.init(key, cv0)

    stages["conv3d_64to32_fullres_decomposed(x1)"] = (
        lambda x, v: conv.apply(v, x),
        cv0,
        cvars,
    )

    # --- cost volume -------------------------------------------------------
    f_l = jax.random.normal(ks[0], (NB, H3, W3, C_full), dtype)
    f_r = jax.random.normal(ks[1], (NB, H3, W3, C_full), dtype)
    stages["cost_volume"] = (
        lambda x, r: build_cost_volume(x, r, D3),
        f_l,
        f_r,
    )

    # --- feature + guidance nets ------------------------------------------
    from ganet_tpu.config import ganet_deep
    from ganet_tpu.models.feature import FeatureNet
    from ganet_tpu.models.guidance import GuidanceNet

    cfg = ganet_deep(
        max_disp=D,
        compute_dtype=args.dtype,
        **({"head_dtype": args.head_dtype} if args.head_dtype else {}),
    )
    img = jax.random.normal(ks[2], (2 * NB, H, W, 3), jnp.float32)
    fnet = FeatureNet(cfg)
    fvars = jax.jit(lambda k: fnet.init(k, img, False))(key)
    stages["feature_net(both views)"] = (
        lambda x, v: fnet.apply(v, x, False),
        img,
        fvars,
    )

    gnet = GuidanceNet(cfg)
    img1 = img[:NB]
    feat1 = jax.random.normal(ks[3], (NB, H3, W3, C_full), dtype)
    gvars = jax.jit(lambda k: gnet.init(k, img1, feat1, False))(key)
    def guidance_all(x, v, f):
        # Sum over every output head so none is dead-code-eliminated.
        leaves = jax.tree_util.tree_leaves(gnet.apply(v, x, f, False))
        return jnp.stack([jnp.mean(l.astype(jnp.float32)) for l in leaves])

    stages["guidance_net"] = (guidance_all, img1, gvars, feat1)

    # --- whole cost-aggregation module (convs + SGA + heads) --------------
    from ganet_tpu.models.aggregation import CostAggregation, DispAggHead

    agg = CostAggregation(cfg)
    cv_in = jax.random.normal(ks[4], (NB, D3, H3, W3, 2 * C_full), dtype)
    guid = {
        "sg_full": [
            jax.random.normal(ks[i % 8], (NB, H3, W3, 4 * 5 * C_full), dtype)
            for i in range(cfg.num_sga_full)
        ],
        "sg_half": [
            jax.random.normal(
                ks[i % 8], (NB, H3 // 2, W3 // 2, 4 * 5 * C_half), dtype
            )
            for i in range(cfg.num_sga_half)
        ],
        "lg1": jax.random.normal(ks[5], (NB, H, W, 75), dtype),
        "lg2": jax.random.normal(ks[6], (NB, H, W, 75), dtype),
    }
    avars = jax.jit(lambda k: agg.init(k, cv_in, guid, False))(key)
    stages["cost_aggregation(module, eval)"] = (
        lambda x, v, g: agg.apply(v, x, g, False)[-1],
        cv_in,
        avars,
        guid,
    )

    dah = DispAggHead(cfg)
    x_agg = jax.random.normal(ks[7], (NB, D3, H3, W3, C_full), dtype)
    dvars = jax.jit(lambda k: dah.init(k, x_agg, guid["lg1"], guid["lg2"], False))(key)
    stages["dispagg_head(module, eval)"] = (
        lambda x, v, l1, l2: dah.apply(v, x, l1, l2, False),
        x_agg,
        dvars,
        guid["lg1"],
        guid["lg2"],
    )

    from ganet_tpu.utils.profiling import trace

    only = [s for s in args.only.split(",") if s]
    for name, (fn, x, *rest) in stages.items():
        if only and not any(o in name for o in only):
            continue
        try:
            if args.trace:
                safe = name.replace("(", "_").replace(")", "").replace(",", "_")
                with trace(os.path.join(args.trace, safe)):
                    sec = benchmark_fn_chained(
                        fn, x, *rest, iters_low=2, iters_high=4
                    )
            else:
                sec = benchmark_fn_chained(
                    fn, x, *rest, iters_low=2, iters_high=4
                )
            print(f"{name:42s} {sec * 1e3:9.2f} ms", flush=True)
        except Exception as e:  # keep going; report the failure
            print(f"{name:42s} FAILED: {type(e).__name__}: {e}", flush=True)
            continue


if __name__ == "__main__":
    main()
