#!/usr/bin/env python
"""Fine-grained latency breakdown of the cost-aggregation hourglass.

profile_breakdown.py showed the whole module at ~437 ms while the sum of
its measured conv/SGA/head stages is ~220 ms; this script times each
structural sub-module at its exact in-model shape to find the rest.

Run on the real chip:  python scripts/profile_agg.py
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
    p.add_argument("--impl", default="pallas", choices=["pallas", "scan"])
    p.add_argument("--only", default="")
    args = p.parse_args(argv)

    apply_platform_overrides()
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from ganet_tpu.config import ganet_deep
    from ganet_tpu.models.aggregation import DispHead, SGABlock
    from ganet_tpu.models.layers import BasicConv, Conv2x
    from ganet_tpu.utils.profiling import benchmark_fn_chained

    H, W, D = args.height, args.width, args.max_disp
    H3, W3, D3 = H // 3, W // 3, D // 3
    dtype = jnp.dtype(args.dtype)
    cfg = ganet_deep(max_disp=D, compute_dtype=args.dtype, sga_impl=args.impl)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    full = (1, D3, H3, W3, 32)       # full cost-volume res, 32 ch
    half = (1, D3 // 2, H3 // 2, W3 // 2, 48)
    quarter = (1, D3 // 4, H3 // 4, W3 // 4, 64)

    x_full = jax.random.normal(ks[0], full, dtype)
    x_half = jax.random.normal(ks[1], half, dtype)
    x_quarter = jax.random.normal(ks[2], quarter, dtype)
    cv = jax.random.normal(ks[3], (1, D3, H3, W3, 64), dtype)
    g_full = jax.random.normal(ks[4], (1, H3, W3, 640), dtype)

    stages = {}

    def add(name, mod, *xs, method=None):
        vs = jax.jit(lambda k: mod.init(k, *xs))(key)
        fn = (lambda x, v, *rest: mod.apply(v, x, *rest)) if method is None else method
        stages[name] = (fn, xs[0], vs, *xs[1:])

    # Full SGABlock (SGA + BN + refine conv + residual) vs bare SGA.
    sgab = SGABlock(32, cfg)
    svars = jax.jit(lambda k: sgab.init(k, x_full, g_full, False))(key)
    stages["sga_block_full(module)"] = (
        lambda x, v, g: sgab.apply(v, x, g, False),
        x_full,
        svars,
        g_full,
    )

    # conv_start: 64 -> 32 full res, no relu.
    cs = BasicConv(32, 3, is_3d=True, relu=False, dtype=dtype)
    cvars = jax.jit(lambda k: cs.init(k, cv, False))(key)
    stages["conv_start(64to32+BN)"] = (
        lambda x, v: cs.apply(v, x, False),
        cv,
        cvars,
    )

    # Conv2x up to full res: deconv(48->32) + concat + fuse(64->32).
    up = Conv2x(32, deconv=True, is_3d=True, relu=False, dtype=dtype)
    uvars = jax.jit(lambda k: up.init(k, x_half, x_full, False))(key)
    stages["conv2x_up_to_full(module)"] = (
        lambda x, v, rem: up.apply(v, x, rem, False),
        x_half,
        uvars,
        x_full,
    )

    # Conv2x down from full res: conv s2 (32->48) + concat + fuse(96->48).
    down = Conv2x(48, is_3d=True, dtype=dtype)
    dvars = jax.jit(lambda k: down.init(k, x_full, x_half, False))(key)
    stages["conv2x_down_from_full(module)"] = (
        lambda x, v, rem: down.apply(v, x, rem, False),
        x_full,
        dvars,
        x_half,
    )

    # Conv2x up to half res (96ch concat).
    up2 = Conv2x(48, deconv=True, is_3d=True, dtype=dtype)
    u2vars = jax.jit(lambda k: up2.init(k, x_quarter, x_half, False))(key)
    stages["conv2x_up_to_half(module)"] = (
        lambda x, v, rem: up2.apply(v, x, rem, False),
        x_quarter,
        u2vars,
        x_half,
    )

    # Descent below full res: half->quarter + quarter->eighth.
    # (the full->half stride-2 conv is inside conv2x_down_from_full)
    d1 = BasicConv(64, 3, stride=2, is_3d=True, dtype=dtype)
    d1v = jax.jit(lambda k: d1.init(k, x_half, False))(key)
    stages["descent_half_to_quarter(s2 48to64)"] = (
        lambda x, v: d1.apply(v, x, False),
        x_half,
        d1v,
    )

    # Initial descent full->half (plain stride-2 conv 32->48 + BN).
    d0 = BasicConv(48, 3, stride=2, is_3d=True, dtype=dtype)
    d0v = jax.jit(lambda k: d0.init(k, x_full, False))(key)
    stages["descent_full_to_half(s2 32to48)"] = (
        lambda x, v: d0.apply(v, x, False),
        x_full,
        d0v,
    )

    # DispHead at full res (conv 32->1 + upsample + softmax + regression).
    dh = DispHead(cfg)
    dhv = jax.jit(lambda k: dh.init(k, x_full, False))(key)
    stages["disp_head(module)"] = (
        lambda x, v: dh.apply(v, x, False),
        x_full,
        dhv,
    )

    # Bare conv 32->1 at full res (the head's MXU-hostile Cout=1 conv).
    c1 = BasicConv(1, 3, is_3d=True, use_bn=False, relu=False, dtype=dtype)
    c1v = jax.jit(lambda k: c1.init(k, x_full, False))(key)
    stages["conv_32to1_fullres"] = (
        lambda x, v: c1.apply(v, x, False),
        x_full,
        c1v,
    )

    # --- composite stages: detect inter-module fusion/layout penalties ---
    # Two chained SGA blocks: if this costs >> 2x one block, composition
    # itself is the problem (layout churn between custom-call boundaries).
    sgab2 = SGABlock(32, cfg, name="b2")
    s2vars = jax.jit(lambda k: sgab2.init(k, x_full, g_full, False))(key)

    def two_blocks(x, v1, v2, g):
        y = sgab.apply(v1, x, g, False)
        return sgab2.apply(v2, y, g, False)

    stages["sga_block_x2_chained"] = (
        two_blocks, x_full, svars, s2vars, g_full
    )

    # conv_start -> sga -> descent(1) -> ascent(1): a vertical slice of the
    # hourglass trunk.
    class TrunkSlice:
        pass

    import flax.linen as nn

    class _Trunk(nn.Module):
        cfg: object

        @nn.compact
        def __call__(self, cv, g, train=False):
            x = BasicConv(32, 3, is_3d=True, relu=False, dtype=dtype)(cv, train)
            x = SGABlock(32, self.cfg)(x, g, train)
            rem0 = x
            x = BasicConv(48, 3, stride=2, is_3d=True, dtype=dtype)(x, train)
            rem1 = x
            x = BasicConv(64, 3, stride=2, is_3d=True, dtype=dtype)(x, train)
            x = Conv2x(48, deconv=True, is_3d=True, dtype=dtype)(x, rem1, train)
            x = Conv2x(32, deconv=True, is_3d=True, relu=False, dtype=dtype)(
                x, rem0, train
            )
            x = SGABlock(32, self.cfg)(x, g, train)
            return x

    trunk = _Trunk(cfg)
    tvars = jax.jit(lambda k: trunk.init(k, cv, g_full, False))(key)
    stages["trunk_slice(cs+sga+desc2+asc2+sga)"] = (
        lambda x, v, g: trunk.apply(v, x, g, False),
        cv,
        tvars,
        g_full,
    )

    # --- SGA-block glue dissection ----------------------------------------
    from ganet_tpu.ops import dispatch
    from ganet_tpu.ops.normalize import normalize_weights

    def guidance_prep(g):
        B_, Hh, Ww = g.shape[0], g.shape[1], g.shape[2]
        k = g.reshape(B_, Hh, Ww, 4, 5, 32)
        k = jnp.moveaxis(k, -1, 3)
        return normalize_weights(k, "l1", axis=-1)

    stages["sga_guidance_prep(reshape+moveaxis+norm)"] = (
        guidance_prep,
        g_full,
    )

    k_pre = jax.jit(guidance_prep)(g_full)
    stages["sga_bare_with_prenormed_k"] = (
        lambda x, k: dispatch.sga(x, k, impl="pallas"),
        x_full,
        k_pre,
    )

    # --- SGA-block TAIL dissection (the BN/relu/refine-conv/residual after
    # the sweeps: block 29.2 ms - sweeps 11.4 - prep 0.3 leaves ~17.5 ms
    # unaccounted at round-4 start) --------------------------------------
    class _TailBNRelu(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.BatchNorm(
                use_running_average=True, momentum=0.9, epsilon=1e-5,
                dtype=dtype,
            )(x)
            return nn.relu(y)

    class _TailFull(nn.Module):
        cfg: object

        @nn.compact
        def __call__(self, x, rem):
            y = nn.BatchNorm(
                use_running_average=True, momentum=0.9, epsilon=1e-5,
                dtype=dtype,
            )(x)
            y = nn.relu(y)
            y = BasicConv(32, 3, is_3d=True, relu=False, dtype=dtype)(y, False)
            return nn.relu(y + rem.astype(y.dtype))

    tb = _TailBNRelu()
    tbv = jax.jit(lambda k: tb.init(k, x_full))(key)
    stages["sga_tail_bn_relu"] = (lambda x, v: tb.apply(v, x), x_full, tbv)

    tf_ = _TailFull(cfg)
    tfv = jax.jit(lambda k: tf_.init(k, x_full, x_full))(key)
    stages["sga_tail_full(bn+relu+conv+bn+res)"] = (
        lambda x, v, rem: tf_.apply(v, x, rem),
        x_full,
        tfv,
        x_full,
    )

    # refine conv alone (BasicConv includes its own BN)
    rc = BasicConv(32, 3, is_3d=True, relu=False, dtype=dtype)
    rcv = jax.jit(lambda k: rc.init(k, x_full, False))(key)
    stages["sga_refine_conv(32to32+bn)"] = (
        lambda x, v: rc.apply(v, x, False),
        x_full,
        rcv,
    )

    only = [s for s in args.only.split(",") if s]
    for name, (fn, x, *rest) in stages.items():
        if only and not any(o in name for o in only):
            continue
        try:
            sec = benchmark_fn_chained(fn, x, *rest, iters_low=2, iters_high=4)
            print(f"{name:44s} {sec * 1e3:9.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:44s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
