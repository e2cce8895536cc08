#!/usr/bin/env python
"""Microbenchmark of 3x3x3 conv strategies at the aggregation-hourglass
shapes (the dominant cost of GANet-deep inference, VERDICT round-1 Weak #1).

Candidates, all computing the same 'SAME' 3D convolution:
  native3d    lax.conv_general_dilated with 3 spatial dims
  via2d       kd batched 2D convs summed (models/layers.py conv3d_via_2d)
  via2d_bf16  same but bf16 accumulation output (halves write traffic)
  dconcat     depth-tap concat along channels -> ONE 2D conv with 3*Cin
              input channels (bigger MXU contraction)
  dconcat_bf16  same with bf16 output

Also times the stride-2 downsample conv and the stride-2 ConvTranspose
(deconv) the hourglass uses.

Run on the real chip: python scripts/bench_conv3d.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ganet_tpu.utils.platform import apply_platform_overrides, enable_compile_cache


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--only", default="")
    args = p.parse_args(argv)

    apply_platform_overrides()
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ganet_tpu.models.layers import conv3d_via_2d
    from ganet_tpu.utils.profiling import benchmark_fn_chained

    dtype = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)

    def flops_same(B, D, H, W, Cin, Cout, k=3, stride=1):
        return 2 * (B * (D // stride) * (H // stride) * (W // stride)) * (
            k * k * k * Cin
        ) * Cout

    cases = []

    # Flagship full-res layer: 64 -> 32 at (64, 192, 320).
    shape_full = (1, 64, 192, 320, 64)
    cases.append(("fullres_64to32", shape_full, 32, 1))
    # Full-res refine conv 32 -> 32 (7 SGA blocks).
    cases.append(("fullres_32to32", (1, 64, 192, 320, 32), 32, 1))
    # Half-res 96 -> 48.
    cases.append(("halfres_96to48", (1, 32, 96, 160, 96), 48, 1))
    # Stride-2 descent 32 -> 48 from full res.
    cases.append(("stride2_32to48", (1, 64, 192, 320, 32), 48, 2))

    results = {}

    def bench(name, fn, x, *rest):
        if args.only and args.only not in name:
            return
        try:
            sec = benchmark_fn_chained(fn, x, *rest, iters_low=2, iters_high=4)
            results[name] = sec
            print(f"{name:36s} {sec * 1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:36s} FAILED: {type(e).__name__}: {e}", flush=True)

    for cname, xshape, Cout, stride in cases:
        B, D, H, W, Cin = xshape
        x = jax.random.normal(key, xshape, dtype)
        k3d = jax.random.normal(key, (3, 3, 3, Cin, Cout), dtype)
        gf = flops_same(B, D, H, W, Cin, Cout, stride=stride) / 1e9

        def native3d(x, k):
            return lax.conv_general_dilated(
                x, k, (stride, stride, stride), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32,
            )

        def via2d(x, k):
            return conv3d_via_2d(x, k, stride)

        def via2d_bf16(x, k):
            # Accumulate each 2D conv in f32 internally but emit bf16.
            B, D, H, W, Cin = x.shape
            kd = k.shape[0]
            Do = -(-D // stride)
            pad_total = max((Do - 1) * stride + kd - D, 0)
            lo = pad_total // 2
            xp = jnp.pad(
                x, ((0, 0), (lo, pad_total - lo), (0, 0), (0, 0), (0, 0))
            )
            out = None
            for dz in range(kd):
                xs = lax.slice_in_dim(
                    xp, dz, dz + stride * (Do - 1) + 1, stride, axis=1
                )
                xs = xs.reshape((B * Do, H, W, Cin))
                o = lax.conv_general_dilated(
                    xs, k[dz], (stride, stride), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.bfloat16,
                )
                out = o if out is None else out + o
            return out.reshape(B, Do, out.shape[1], out.shape[2], -1)

        def dconcat(x, k, pet=jnp.float32):
            # Concat the kd depth taps into channels -> one 2D conv whose
            # contraction is kd*Cin wide (one big MXU matmul per window).
            B, D, H, W, Cin = x.shape
            kd = k.shape[0]
            Do = -(-D // stride)
            pad_total = max((Do - 1) * stride + kd - D, 0)
            lo = pad_total // 2
            xp = jnp.pad(
                x, ((0, 0), (lo, pad_total - lo), (0, 0), (0, 0), (0, 0))
            )
            taps = [
                lax.slice_in_dim(
                    xp, dz, dz + stride * (Do - 1) + 1, stride, axis=1
                )
                for dz in range(kd)
            ]
            xc = jnp.concatenate(taps, axis=-1).reshape(B * Do, H, W, kd * Cin)
            kc = jnp.concatenate([k[dz] for dz in range(kd)], axis=2).reshape(
                3, 3, kd * Cin, -1
            )
            o = lax.conv_general_dilated(
                xc, kc, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=pet,
            )
            return o.reshape(B, Do, o.shape[1], o.shape[2], -1)

        def dsplit(x, k, pet=jnp.float32):
            # ONE 2D conv with kd*Cout output channels (tap-major), then a
            # D-shifted add: out(d) = sum_dz y_dz(d + dz - 1).  Same FLOPs,
            # 3x the MXU lane utilization when Cout < 128.  Stride-1 only.
            B, D, H, W, Cin = x.shape
            kd = k.shape[0]
            Cout_ = k.shape[-1]
            k2 = jnp.concatenate([k[dz] for dz in range(kd)], axis=-1)
            y = lax.conv_general_dilated(
                x.reshape(B * D, H, W, Cin), k2, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=pet,
            ).reshape(B, D, H, W, kd, Cout_)
            # 'SAME' over D with kd=3: out(d) = y0(d-1) + y1(d) + y2(d+1)
            # MEASURED: no win over via2d (14.06 vs 14.10 ms bf16 at the
            # flagship shape) — kept as a documented negative result.
            zrow = jnp.zeros_like(y[:, :1, ..., 0, :])
            out = y[:, :, ..., 1, :]
            out = out + jnp.concatenate(
                [zrow, y[:, :-1, ..., 0, :]], axis=1
            )
            out = out + jnp.concatenate(
                [y[:, 1:, ..., 2, :], zrow], axis=1
            )
            return out

        # NOTE: two Pallas conv3d kernels were benchmarked here and RETIRED
        # in round 3 (see models/layers.py FastConv3d): taps-variant
        # (9 K=Cin matmuls) 17.1 ms, im2col (K=9*Cin, 3*Cout output lanes)
        # 14.7 ms, Th 8->32 sweep 14.6->14.0 ms — a FLOP-independent ~14 ms
        # floor at both Cin=64 and Cin=32, vs via2d_bf16's 14.3 / 8.2 ms.
        print(f"--- {cname}  {xshape} -> C{Cout} s{stride}  ({gf:.1f} GFLOP)")
        if stride == 1:
            bench(f"{cname}/dsplit", dsplit, x, k3d)
            bench(
                f"{cname}/dsplit_bf16",
                lambda x, k: dsplit(x, k, jnp.bfloat16),
                x,
                k3d,
            )
        bench(f"{cname}/native3d", native3d, x, k3d)
        bench(f"{cname}/via2d", via2d, x, k3d)
        bench(f"{cname}/via2d_bf16", via2d_bf16, x, k3d)
        bench(f"{cname}/dconcat", dconcat, x, k3d)
        bench(
            f"{cname}/dconcat_bf16",
            lambda x, k: dconcat(x, k, jnp.bfloat16),
            x,
            k3d,
        )
        if stride == 1:
            # one-shot numeric sanity of the dsplit decomposition
            import numpy as np

            xs = jax.random.normal(key, (1, 5, 8, 9, 4), jnp.float32)
            ks = jax.random.normal(key, (3, 3, 3, 4, 6), jnp.float32)
            np.testing.assert_allclose(
                np.asarray(dsplit(xs, ks)),
                np.asarray(
                    lax.conv_general_dilated(
                        xs, ks, (1, 1, 1), "SAME",
                        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    )
                ),
                rtol=2e-4, atol=2e-4,
            )
        for n in (
            "native3d", "via2d", "via2d_bf16", "dconcat", "dconcat_bf16",
            "dsplit", "dsplit_bf16",
        ):
            key_ = f"{cname}/{n}"
            if key_ in results:
                tf = gf / results[key_] / 1e3
                print(f"    {n:20s} {tf:6.1f} TFLOP/s")

    # Deconv (stride-2 ConvTranspose, kernel 4) — the hourglass ascent.
    import flax.linen as nn

    for dname, xshape, Cout in (
        ("deconv_48to32_to_fullres", (1, 32, 96, 160, 48), 32),
        ("deconv_64to48", (1, 16, 48, 80, 64), 48),
    ):
        xd = jax.random.normal(key, xshape, dtype)
        deconv = nn.ConvTranspose(
            Cout, kernel_size=(4, 4, 4), strides=(2, 2, 2), padding="SAME",
            use_bias=False, dtype=dtype,
        )
        dv = deconv.init(key, xd)
        bench(f"{dname}/convtranspose", lambda x, v: deconv.apply(v, x), xd, dv)

        # Alternative: nearest/zero-stuff upsample + regular conv? Cheaper
        # form: 2x2x2 subpixel deconv == one 1x1x1 conv to 8*Cout then
        # depth-to-space.  kernel=4 'SAME' stride 2 == each output position
        # sees a 2x2x2 subset of taps -> equivalent to 8 independent
        # 2x2x2-tap convs (subpixel decomposition).
        def subpixel_deconv(x, k4):
            # k4: (4, 4, 4, Cin, Cout) transpose-conv kernel.  Output at
            # (2i+a, 2j+b, 2l+c) = sum over taps where kernel index
            # kz = 2*dz + a ... build as 8 small convs + interleave.
            B, D, H, W, Cin = x.shape
            outs = {}
            for a in (0, 1):
                for b in (0, 1):
                    for c in (0, 1):
                        # taps (kz, ky, kx) with kz % 2 == a etc.; each is a
                        # 2x2x2 conv over x.
                        kk = k4[a::2, b::2, c::2]  # (2, 2, 2, Cin, Cout)
                        o = None
                        for dz in range(2):
                            xs = jnp.pad(
                                x, ((0, 0), (1, 0), (1, 0), (1, 0), (0, 0))
                            )[:, dz : dz + D, :, :, :]
                            xs2 = xs.reshape(B * D, H + 1, W + 1, Cin)
                            oo = lax.conv_general_dilated(
                                xs2, kk[dz], (1, 1), "VALID",
                                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                preferred_element_type=jnp.float32,
                            )
                            o = oo if o is None else o + oo
                        outs[(a, b, c)] = o.reshape(B, D, H, W, -1)
            # interleave
            z = jnp.stack(
                [outs[(a, b, c)] for a in (0, 1) for b in (0, 1) for c in (0, 1)],
                axis=-2,
            )  # (B, D, H, W, 8, Cout)
            z = z.reshape(B, D, H, W, 2, 2, 2, -1)
            z = jnp.transpose(z, (0, 1, 4, 2, 5, 3, 6, 7))
            return z.reshape(B, 2 * D, 2 * H, 2 * W, -1)

        # correctness unchecked here — timing signal only
        k4 = jax.random.normal(key, (4, 4, 4, xshape[-1], Cout), dtype)
        bench(f"{dname}/subpixel8", subpixel_deconv, xd, k4)


if __name__ == "__main__":
    main()
