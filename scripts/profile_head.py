#!/usr/bin/env python
"""Sub-stage dissection of the DispAgg head (reference `DispAgg` in
models/GANet_deep.py, SURVEY.md §2 #7) plus dtype variants.

profile_breakdown.py times the head as one module (54.5 ms at batch 1,
576x960, round 2); this script breaks that into conv/upsample/LGA/softmax/
renorm stages and measures the candidate optimizations named by the round-3
review: bf16 full-res volumes and a fused renorm+regression.

Run on the real chip:  python scripts/profile_head.py
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
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--only", default="")
    args = p.parse_args(argv)

    apply_platform_overrides()
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from ganet_tpu.ops import dispatch, l1_normalize
    from ganet_tpu.ops.disparity import disparity_regression, trilinear_upsample
    from ganet_tpu.utils.profiling import benchmark_fn_chained

    H, W, D = args.height, args.width, args.max_disp
    H3, W3, D3 = H // 3, W // 3, D // 3
    NB = args.batch
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    x_low = jax.random.normal(ks[0], (NB, D3, H3, W3), jnp.float32)
    x_full_f32 = jax.random.normal(ks[1], (NB, D, H, W), jnp.float32)
    x_full_bf16 = x_full_f32.astype(jnp.bfloat16)
    g_raw = jax.random.uniform(ks[2], (NB, H, W, 75), jnp.float32)
    g_norm = l1_normalize(g_raw, axis=-1)
    g_norm_bf16 = g_norm.astype(jnp.bfloat16)
    # positive "probability-like" volume for renorm/regression stages
    p_full = jax.nn.softmax(-x_full_f32, axis=1)

    stages = {}

    # --- upsample ---------------------------------------------------------
    stages["upsample_f32"] = (
        lambda x: trilinear_upsample(x, (D, H, W)),
        x_low,
    )
    stages["upsample_bf16"] = (
        lambda x: trilinear_upsample(x.astype(jnp.bfloat16), (D, H, W)),
        x_low,
    )

    # --- guidance L1 normalization (x2 in the head) -----------------------
    stages["l1norm_g75_f32"] = (lambda g: l1_normalize(g, axis=-1), g_raw)

    # --- one LGA pass -----------------------------------------------------
    stages["lga_pass_f32"] = (
        lambda x, g: dispatch.lga(x, g, radius=2, repeats=1, impl="pallas"),
        x_full_f32,
        g_norm,
    )
    stages["lga_pass_bf16"] = (
        lambda x, g: dispatch.lga(x, g, radius=2, repeats=1, impl="pallas"),
        x_full_bf16,
        g_norm_bf16,
    )
    stages["lga_x2_f32"] = (
        lambda x, g: dispatch.lga(x, g, radius=2, repeats=2, impl="pallas"),
        x_full_f32,
        g_norm,
    )

    # --- softmax over the 192-bin disparity axis --------------------------
    stages["softmax_f32"] = (
        lambda x: jax.nn.softmax(-x, axis=1),
        x_full_f32,
    )
    stages["softmax_bf16io"] = (
        lambda x: jax.nn.softmax(-x.astype(jnp.float32), axis=1).astype(
            jnp.bfloat16
        ),
        x_full_bf16,
    )

    # --- renorm + regression: current two-pass vs fused two-reduction -----
    def renorm_reg(p):
        p = p / jnp.maximum(jnp.sum(jnp.abs(p), axis=1, keepdims=True), 1e-6)
        return disparity_regression(p, D)

    stages["renorm_reg_f32(current)"] = (renorm_reg, p_full)

    def fused_reg(p):
        d = jnp.arange(D, dtype=p.dtype).reshape(1, D, 1, 1)
        num = jnp.sum(p * d, axis=1)
        den = jnp.maximum(jnp.sum(jnp.abs(p), axis=1), 1e-6)
        return num / den

    stages["renorm_reg_fused"] = (fused_reg, p_full)
    stages["renorm_reg_fused_bf16in"] = (
        lambda p: fused_reg(p.astype(jnp.float32)),
        p_full.astype(jnp.bfloat16),
    )

    # --- the head's 32->1 3x3x3 conv: MXU-hostile Cout=1 -------------------
    from jax import lax

    from ganet_tpu.models.layers import conv3d_via_2d

    x_agg = jax.random.normal(ks[3], (NB, D3, H3, W3, 32), jnp.bfloat16)
    k1 = jax.random.normal(ks[4], (3, 3, 3, 32, 1), jnp.bfloat16)

    stages["conv32to1_via2d(current)"] = (
        lambda x, k: conv3d_via_2d(x, k, 1, out_dtype=jnp.bfloat16),
        x_agg,
        k1,
    )

    def conv1_native(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.bfloat16,
        )

    stages["conv32to1_native3d"] = (conv1_native, x_agg, k1)

    def conv1_dsplit(x, k):
        # Pack the kd=3 depth taps into output channels of ONE 2D conv
        # (Cout 1 -> 3), then combine with a D-shifted add: 3x the MXU lane
        # utilization and one conv dispatch instead of three.
        B, D_, H_, W_, Cin = x.shape
        k2 = jnp.concatenate([k[dz] for dz in range(3)], axis=-1)
        y = lax.conv_general_dilated(
            x.reshape(B * D_, H_, W_, Cin), k2, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        ).reshape(B, D_, H_, W_, 3, 1)
        zrow = jnp.zeros_like(y[:, :1, ..., 0, :])
        out = y[:, :, ..., 1, :]
        out = out + jnp.concatenate([zrow, y[:, :-1, ..., 0, :]], axis=1)
        out = out + jnp.concatenate([y[:, 1:, ..., 2, :], zrow], axis=1)
        return out

    stages["conv32to1_dsplit"] = (conv1_dsplit, x_agg, k1)

    # --- full head pipelines (everything after the 32->1 conv) ------------
    def head_f32(x, l1, l2):
        x = trilinear_upsample(x, (D, H, W))
        l1 = l1_normalize(l1, axis=-1)
        l2 = l1_normalize(l2, axis=-1)
        x = dispatch.lga(x, l1, radius=2, repeats=2, impl="pallas")
        p = jax.nn.softmax(-x, axis=1)
        p = dispatch.lga(p, l2, radius=2, repeats=2, impl="pallas")
        p = p / jnp.maximum(jnp.sum(jnp.abs(p), axis=1, keepdims=True), 1e-6)
        return disparity_regression(p, D)

    stages["head_after_conv_f32(current)"] = (head_f32, x_low, g_raw, g_raw)

    def head_bf16(x, l1, l2):
        x = trilinear_upsample(x.astype(jnp.bfloat16), (D, H, W))
        l1 = l1_normalize(l1, axis=-1).astype(jnp.bfloat16)
        l2 = l1_normalize(l2, axis=-1).astype(jnp.bfloat16)
        x = dispatch.lga(x, l1, radius=2, repeats=2, impl="pallas")
        p = jax.nn.softmax(-x.astype(jnp.float32), axis=1).astype(jnp.bfloat16)
        p = dispatch.lga(p, l2, radius=2, repeats=2, impl="pallas")
        pf = p.astype(jnp.float32)
        d = jnp.arange(D, dtype=jnp.float32).reshape(1, D, 1, 1)
        num = jnp.sum(pf * d, axis=1)
        den = jnp.maximum(jnp.sum(jnp.abs(pf), axis=1), 1e-6)
        return num / den

    stages["head_after_conv_bf16"] = (head_bf16, x_low, g_raw, g_raw)

    only = [s for s in args.only.split(",") if s]
    for name, (fn, x, *rest) in stages.items():
        if only and not any(o in name for o in only):
            continue
        try:
            sec = benchmark_fn_chained(fn, x, *rest, iters_low=2, iters_high=4)
            print(f"{name:36s} {sec * 1e3:9.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:36s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
