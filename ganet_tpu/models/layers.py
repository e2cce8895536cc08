"""Shared conv building blocks.

Reference: `BasicConv` and `Conv2x` in models/GANet_deep.py (SURVEY.md §2
#7): conv-or-deconv (2D or 3D) + BatchNorm + ReLU, and the down/up
skip-concat pair used by every hourglass in the network.

TPU-first notes: channels-last layouts (NHWC / NDHWC) so channels ride the
128-lane axis and convs hit the MXU; 'SAME' padding everywhere (equivalent
to the reference's explicit symmetric padding at these kernel sizes);
parameters live in float32, compute dtype is configurable (bfloat16 for the
performance path — the MXU's native input type).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

Dtype = Any


def conv3d_via_2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: int = 1,
    out_dtype=None,
) -> jnp.ndarray:
    """3D 'SAME' convolution decomposed into kd batched 2D convolutions.

    XLA's native 3-spatial-dim convolution reaches only ~16 TFLOP/s at this
    model's stride-1 shapes (26.4 ms for 3x3x3 64->32 on a (64,192,320)
    volume); folding the disparity axis into the conv batch and summing
    over the kd depth taps is mathematically identical and reaches
    ~27-31 TFLOP/s (14-16 ms; scripts/bench_conv3d.py).  STRIDE-2 inverts
    this: the strided D-slices defeat XLA's fusion and the decomposition
    runs 3x SLOWER than the native conv (23.4 vs 7.8 ms) — callers must
    route stride>1 to lax.conv directly (FastConv3d below does).

    Matches XLA 'SAME' padding exactly (low-side pad = pad_total//2) so it
    is interchangeable with lax.conv.

    Args:
      x: (B, D, H, W, Cin).
      kernel: (kd, kh, kw, Cin, Cout) — DHWIO, the nn.Conv layout.
      stride: common stride for all three spatial dims (1 or 2).
      out_dtype: per-tap conv output dtype (MXU accumulation is f32
        regardless); bf16 halves the inter-tap HBM traffic and measures
        ~15% faster end-to-end at bf16 model dtype.  Defaults to f32.
    Returns:
      (B, D', H', W', Cout) in `out_dtype`.
    """
    B, D, H, W, Cin = x.shape
    kd = kernel.shape[0]
    Do = -(-D // stride)
    pad_total = max((Do - 1) * stride + kd - D, 0)
    lo = pad_total // 2
    xp = jnp.pad(x, ((0, 0), (lo, pad_total - lo), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(kd):
        xs = lax.slice_in_dim(xp, dz, dz + stride * (Do - 1) + 1, stride, axis=1)
        xs = xs.reshape((B * Do, H, W, Cin))
        o = lax.conv_general_dilated(
            xs,
            kernel[dz],
            (stride, stride),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=out_dtype or jnp.float32,
        )
        out = o if out is None else out + o
    Ho, Wo = out.shape[1], out.shape[2]
    return out.reshape(B, Do, Ho, Wo, out.shape[-1])


def conv3d_dsplit(
    x: jnp.ndarray, kernel: jnp.ndarray, out_dtype=None
) -> jnp.ndarray:
    """Stride-1 'SAME' 3D conv with the kd=3 depth taps packed into OUTPUT
    channels of one 2D conv, combined by a D-shifted add.

    For tiny Cout this triples the MXU lane utilization and replaces three
    conv dispatches with one: the disparity heads' 3x3x3 32->1 conv
    (reference `Disp`/`DispAgg` heads, models/GANet_deep.py) runs 13.1 ms
    as a native 3D conv and 5.1 ms decomposed (conv3d_via_2d), but 4.1 ms
    in this formulation (measured 576x960 D=192 bf16, v5e).  At Cout=32 it
    is neutral vs conv3d_via_2d (scripts/bench_conv3d.py `dsplit`), so
    FastConv3d routes only small feature counts here.
    """
    B, D, H, W, Cin = x.shape
    kd = kernel.shape[0]
    if kd != 3:
        raise ValueError(f"conv3d_dsplit requires kd=3, got {kd}")
    Cout = kernel.shape[-1]
    k2 = jnp.concatenate([kernel[dz] for dz in range(kd)], axis=-1)
    y = lax.conv_general_dilated(
        x.reshape(B * D, H, W, Cin),
        k2,
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype or jnp.float32,
    ).reshape(B, D, H, W, kd, Cout)
    # 'SAME' over D with kd=3: out(d) = y0(d-1) + y1(d) + y2(d+1).
    zrow = jnp.zeros_like(y[:, :1, ..., 0, :])
    out = y[:, :, ..., 1, :]
    out = out + jnp.concatenate([zrow, y[:, :-1, ..., 0, :]], axis=1)
    out = out + jnp.concatenate([y[:, 1:, ..., 2, :], zrow], axis=1)
    return out


class FoldableBN(nn.Module):
    """BatchNorm with nn.BatchNorm's exact variable layout (params
    scale/bias, batch_stats mean/var under the same "BatchNorm_0"-style
    path — checkpoint-interchangeable) whose eval-time affine can be FOLDED
    into the preceding conv's kernel and bias.

    Why: XLA does not fuse elementwise producers/consumers into convolution
    custom calls, so conv -> BN -> ReLU costs one full extra volume pass
    per conv at eval (measured 2.15 ms per full-res aggregation pass,
    scripts/profile_agg.py `sga_tail_bn_relu`).  With k' = k*s and
    b' = bias - mean*s where s = scale/sqrt(var+eps), the BN is exactly
    free: the bias+relu epilogue rides the depth-tap-sum fusion that
    conv3d_via_2d already pays for.  Standard inference BN folding — a
    deployment transform the reference (PyTorch BatchNorm3d) never shipped.

    Cross-device stats: under the jit + NamedSharding data-parallel path
    (the trainer's), XLA sees the GLOBAL batch, so train-mode stats are
    already sync-BN with no extra plumbing.  Under shard_map (where each
    program instance sees only its shard), set `axis_name` to pmean the
    batch moments across that mesh axis — same knob nn.BatchNorm exposes
    (ADVICE r4 #3).
    """

    channels: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.channels,), jnp.float32
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.channels,), jnp.float32
        )
        self.ra_mean = self.variable(
            "batch_stats",
            "mean",
            lambda: jnp.zeros((self.channels,), jnp.float32),
        )
        self.ra_var = self.variable(
            "batch_stats",
            "var",
            lambda: jnp.ones((self.channels,), jnp.float32),
        )

    def affine(self):
        """(s, t) such that eval-mode BN(x) == x * s + t (f32)."""
        s = self.scale / jnp.sqrt(self.ra_var.value + self.epsilon)
        return s, self.bias - self.ra_mean.value * s

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if not train:
            s, t = self.affine()
            return (
                x.astype(self.dtype) * s.astype(self.dtype)
                + t.astype(self.dtype)
            )
        red = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        m = jnp.mean(xf, axis=red)
        sq = jnp.mean(jnp.square(xf), axis=red)
        if self.axis_name is not None:
            # shard_map data parallelism: sync the raw moments so running
            # stats and normalization see the global batch (sync-BN).
            m = lax.pmean(m, self.axis_name)
            sq = lax.pmean(sq, self.axis_name)
        v = sq - jnp.square(m)
        if not self.is_initializing():
            # Running stats update mirrors nn.BatchNorm (biased variance).
            self.ra_mean.value = (
                self.momentum * self.ra_mean.value + (1.0 - self.momentum) * m
            )
            self.ra_var.value = (
                self.momentum * self.ra_var.value + (1.0 - self.momentum) * v
            )
        s = self.scale / jnp.sqrt(v + self.epsilon)
        return ((xf - m) * s + self.bias).astype(self.dtype)


class FastConv3d(nn.Module):
    """Drop-in 3x3x3 'SAME' conv module computing via conv3d_via_2d.

    Same parameter structure as nn.Conv (kernel DHWIO, optional bias).
    `scale`/`offset` call args apply a folded per-output-channel affine
    (see FoldableBN): kernel is pre-scaled in f32 and the offset rides the
    epilogue fusion."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, scale=None, offset=None
    ) -> jnp.ndarray:
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (k, k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        if scale is not None:
            kernel = kernel * scale
        xc = x.astype(self.dtype)
        kc = kernel.astype(self.dtype)
        if self.stride > 1:
            # Strided: the 2D decomposition is 3x slower than XLA's native
            # conv here (scripts/bench_conv3d.py) — use the native path.
            y = lax.conv_general_dilated(
                xc,
                kc,
                (self.stride,) * 3,
                "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=self.dtype,
            )
        elif self.features <= 4 and self.kernel_size == 3:
            # Tiny output widths (the heads' C->1 convs): depth-tap output
            # packing beats the batched-2D decomposition (see conv3d_dsplit).
            y = conv3d_dsplit(xc, kc, out_dtype=self.dtype)
        else:
            # A fused Pallas conv3d was built and RETIRED (round 3): two
            # kernel variants (nine K=Cin matmuls; im2col with K=9*Cin and
            # 3*Cout-packed output lanes) plus a Th=8..32 tile sweep all
            # floor at ~14 ms at the flagship shape regardless of Cin —
            # a FLOP-independent bound — while XLA's decomposed lowering
            # scales with FLOPs and wins at every measured shape (14.3 ms
            # at Cin=64, 8.2 ms at Cin=32, bf16 taps).  See README
            # "Roofline accounting" for the full negative result.
            y = conv3d_via_2d(xc, kc, self.stride, out_dtype=self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias
        if offset is not None:
            y = y + offset.astype(y.dtype)
        return y.astype(self.dtype)


class BasicConv(nn.Module):
    """Conv/deconv + optional BatchNorm + optional ReLU (2D or 3D)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    is_3d: bool = False
    deconv: bool = False
    use_bn: bool = True
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dims = 3 if self.is_3d else 2
        strides = (self.stride,) * dims
        fast3d = self.is_3d and not self.deconv and self.dilation == 1
        if self.deconv:
            # Stride-2 deconv uses a 4-wide kernel for exact 2x upsampling
            # (reference uses ConvTranspose(kernel=4, stride=2, padding=1)).
            k = 4 if self.stride == 2 else self.kernel_size
            # NO BN folding on deconvs — measured NEGATIVE result (round 5
            # bisect): folding the eval BN affine into the ConvTranspose
            # kernel (round 4's FoldableConvTranspose) regressed the
            # batch-4 flagship inference 1073 -> 1268 ms (-15%), neutral
            # at batch 1; disabling it restored 1073.0 ms in the same
            # session (probe-pinned chip state).  The bare lhs-dilated
            # convolution lowers to identical StableHLO either way, so the
            # kernel-side affine (kernel*s per call) evidently defeats a
            # weight-processing fast path at larger batch.  The fold also
            # had NOTHING to save: an isolated on-chip probe of the
            # representative hourglass deconv (4,32,96,160,48)->stride-2
            # bf16 measures deconv+relu 27.08 ms vs deconv+BN-affine+relu
            # 26.92 ms — XLA fuses the post-deconv scale/shift for free,
            # unlike the plain-conv case where the separate BN pass was
            # real (profile_agg `sga_tail_bn_relu`, 2.15 ms).  The
            # conv-side fold (FastConv3d below) remains a measured win.
            x = nn.ConvTranspose(
                self.features,
                kernel_size=(k,) * dims,
                strides=strides,
                padding="SAME",
                use_bias=not self.use_bn,
                dtype=self.dtype,
                kernel_init=nn.initializers.he_normal(),
            )(x)
        elif fast3d:
            # Hot path: every 3D conv in the aggregation hourglass.  At
            # eval the BatchNorm is folded into the conv (FoldableBN) —
            # same variable tree, one fewer full-volume pass per conv.
            conv = FastConv3d(
                self.features,
                kernel_size=self.kernel_size,
                stride=self.stride,
                use_bias=not self.use_bn,
                dtype=self.dtype,
                name="FastConv3d_0",
            )
            if self.use_bn:
                bn = FoldableBN(
                    self.features, dtype=self.dtype, name="BatchNorm_0"
                )
                if train:
                    x = bn(conv(x), train=True)
                else:
                    s, t = bn.affine()
                    x = conv(x, scale=s, offset=t)
            else:
                x = conv(x)
            if self.relu:
                x = nn.relu(x)
            return x
        else:
            x = nn.Conv(
                self.features,
                kernel_size=(self.kernel_size,) * dims,
                strides=strides,
                padding="SAME",
                kernel_dilation=(self.dilation,) * dims,
                use_bias=not self.use_bn,
                dtype=self.dtype,
                kernel_init=nn.initializers.he_normal(),
            )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
            )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class Conv2x(nn.Module):
    """Down- or up-sampling conv followed by skip-concat and a fusing conv.

    forward(x, rem): resample x by 2x (conv stride 2, or deconv stride 2),
    concat with the skip tensor `rem` (same spatial shape after resampling),
    then a 3x3(x3) conv back to `features` channels.  Mirrors reference
    Conv2x (models/GANet_deep.py)."""

    features: int
    deconv: bool = False
    is_3d: bool = False
    relu: bool = True  # relu of the fusing conv (reference passes relu=False
    # on the last deconv before an SGA block, which BN+ReLUs itself)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, rem: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        x = BasicConv(
            self.features,
            kernel_size=3,
            stride=2,
            is_3d=self.is_3d,
            deconv=self.deconv,
            dtype=self.dtype,
        )(x, train)
        if x.shape[:-1] != rem.shape[:-1]:
            raise ValueError(
                f"Conv2x skip mismatch: {x.shape} vs rem {rem.shape}"
            )
        x = jnp.concatenate([x, rem], axis=-1)
        x = BasicConv(
            self.features,
            kernel_size=3,
            stride=1,
            is_3d=self.is_3d,
            relu=self.relu,
            dtype=self.dtype,
        )(x, train)
        return x


def channel_schedule(base: int, levels: int) -> list[int]:
    """Hourglass channel widths per level.

    For base=32, levels=4 -> [32, 48, 64, 96, 128], the reference's feature
    net schedule (models/GANet_deep.py Feature)."""
    mults = [1.0, 1.5, 2.0, 3.0, 4.0, 6.0, 8.0]
    if levels + 1 > len(mults):
        raise ValueError(f"too many levels: {levels}")
    return [max(1, int(base * m)) for m in mults[: levels + 1]]
