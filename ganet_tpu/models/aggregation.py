"""Cost aggregation: 3D-conv hourglass interleaved with SGA blocks, plus
the disparity heads.

Reference: `CostAggregation`, `SGABlock`, `Disp`, `DispAgg` in
models/GANet_deep.py (SURVEY.md §0 steps 3-5, §2 #7).  For the deep preset
(base 32 channels, 3 levels, 2 cycles) this reproduces the reference
layout: conv_start -> sga1 -> [disp0] -> conv1a + sga11 -> conv2a -> conv3a
-> deconv3a -> deconv2a + sga12 -> deconv1a -> sga2 -> [disp1] -> conv1b +
sga13 -> ... -> deconv1b -> sga3 -> DispAgg -> disp2, with SGA blocks at
1/3 resolution (C channels) and 1/6 resolution (1.5C channels).

TPU-first notes: the cost volume is kept channels-last (B, D, H, W, C) so
3D convs lower to MXU matmuls over the channel axis; SGA/LGA dispatch to
either the lax.scan oracle or the Pallas kernels (ops/dispatch.py).
"""

from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax.sharding import Mesh

from ganet_tpu.config import ModelConfig
from ganet_tpu.models.layers import (
    BasicConv,
    Conv2x,
    FastConv3d,
    channel_schedule,
)
from ganet_tpu.ops import dispatch
from ganet_tpu.ops.disparity import disparity_regression, trilinear_upsample
from ganet_tpu.ops.normalize import l1_normalize, normalize_weights
from ganet_tpu.parallel.mesh import constrain_sweep, constrain_volume


class SGABlock(nn.Module):
    """SGA + BN/refine conv + residual ReLU (reference SGABlock).

    With a mesh whose 'space' axis is >1, the SGA op runs as the
    wavefront-pipelined cross-shard sweep (parallel/sharded_sga.py)."""

    channels: int
    cfg: ModelConfig
    refine: bool = True
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, g: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        cfg = self.cfg
        C = self.channels
        if x.shape[-1] != C:
            raise ValueError(f"SGABlock expects {C} channels, got {x.shape}")
        if g.shape[-1] != 4 * 5 * C:
            raise ValueError(
                f"guidance must have {4 * 5 * C} channels, got {g.shape}"
            )
        rem = x
        B, H, W = g.shape[0], g.shape[1], g.shape[2]
        # Packing: head emits (dir, weight, channel) fastest-last; regroup to
        # (B, H, W, C, 4, 5) and normalize the 5-weight sets (l1 | softmax,
        # cfg.sga_norm — see ops/normalize.py for the open reference
        # question).  A "packed" alternative that canonicalized straight
        # from the raw (B,H,W,640) layout (to dodge this tensor's 5-wide
        # minor dim) was built and MEASURED WORSE at batch 4 (1070 ->
        # 1269 ms full model) and neutral at batch 1 — reverted round 4;
        # XLA evidently fuses this unpack into the downstream transposes
        # better than the hand-chosen transpose order.
        dtype = jnp.dtype(cfg.compute_dtype)
        k = g.reshape(B, H, W, 4, 5, C)
        k = jnp.moveaxis(k, -1, 3)  # (B, H, W, C, 4, 5)
        k = normalize_weights(k, cfg.sga_norm, axis=-1)
        if cfg.channel_tp:
            # Channel-TP shards the hourglass's C over the 'disp' mesh
            # axis; the sweep kernels run channel-local, so re-shard to
            # the (data, space)-only sweep layout here (the conv-phase
            # constraint after the block re-shards C).
            x = constrain_sweep(x, self.mesh)
        x = dispatch.sga(x, k, impl=cfg.sga_impl, mesh=self.mesh)
        # dtype= throughout: a dtype-less flax layer silently promotes the
        # full-res volume to f32 (2x HBM traffic per pass — measured ~17 ms
        # of glue per block at bf16 before this was pinned).
        if self.refine:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=dtype,
            )(x)
            x = nn.relu(x)
            x = BasicConv(C, 3, is_3d=True, relu=False, dtype=dtype)(x, train)
        else:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=dtype,
            )(x)
        return nn.relu(x + rem.astype(x.dtype))


class DispHead(nn.Module):
    """Aggregated volume -> disparity map (reference `Disp`):
    3D conv C->1, trilinear upsample x3 (D, H, W), softmax over negated
    cost, expectation.  The full-res volume stays H-sharded under a mesh
    (softmax/regression only reduce over the local D axis)."""

    cfg: ModelConfig
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        # Cout=1 conv: depth-tap output packing (FastConv3d -> conv3d_dsplit,
        # 13.1 -> 4.1 ms at the flagship shape vs the native 3D conv).  The
        # explicit name keeps the parameter path of the nn.Conv this
        # replaces ("Conv_0"/kernel, same DHWIO shape) so checkpoints are
        # unaffected.
        x = FastConv3d(
            1, 3, use_bias=False, dtype=jnp.dtype(cfg.compute_dtype),
            name="Conv_0",
        )(x)
        x = x[..., 0]  # (B, Dr, H3, W3)
        D = cfg.max_disp
        H, W = x.shape[2] * 3, x.shape[3] * 3
        x = trilinear_upsample(
            x.astype(jnp.dtype(cfg.resolved_head_dtype)), (D, H, W)
        )
        x = constrain_volume(x, self.mesh)
        # Softmax/expectation accumulate in f32 regardless of head_dtype.
        p = nn.softmax(-x.astype(jnp.float32), axis=1)
        return disparity_regression(p, D)


class DispAggHead(nn.Module):
    """Final head with LGA refinement (reference `DispAgg`): LGA before the
    softmax (cost sharpening) and after it (probability sharpening), then
    re-normalization and expectation.

    With a mesh whose 'space' axis is >1, the full-resolution (B, D, H, W)
    volume — the model's largest tensor — stays H-sharded end to end: the
    upsample/softmax run under a sharding constraint and the LGA stencils
    run as halo-exchange shard_maps (parallel/sharded_lga.py)."""

    cfg: ModelConfig
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        lg1: jnp.ndarray,
        lg2: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        r = cfg.lga_radius
        # Cout=1 conv via depth-tap output packing (see DispHead).
        x = FastConv3d(
            1, 3, use_bias=False, dtype=jnp.dtype(cfg.compute_dtype),
            name="Conv_0",
        )(x)
        x = x[..., 0]
        D = cfg.max_disp
        H, W = x.shape[2] * 3, x.shape[3] * 3
        hd = jnp.dtype(cfg.resolved_head_dtype)
        x = trilinear_upsample(x.astype(hd), (D, H, W))
        x = constrain_volume(x, self.mesh)
        lg1 = l1_normalize(lg1.astype(jnp.float32), axis=-1).astype(hd)
        lg2 = l1_normalize(lg2.astype(jnp.float32), axis=-1).astype(hd)
        x = dispatch.lga(
            x,
            lg1,
            radius=r,
            repeats=cfg.lga_repeats,
            impl=cfg.sga_impl,
            mesh=self.mesh,
        )
        # Softmax accumulates in f32; the materialized probabilities stay in
        # head_dtype for the second LGA pass.
        p = nn.softmax(-x.astype(jnp.float32), axis=1).astype(hd)
        p = dispatch.lga(
            p,
            lg2,
            radius=r,
            repeats=cfg.lga_repeats,
            impl=cfg.sga_impl,
            mesh=self.mesh,
        )
        # Re-normalization to a probability distribution (reference
        # F.normalize(p=1)) fused with the expectation: dividing the
        # expectation by the per-pixel mass is algebraically identical to
        # normalizing the volume first, but skips one full-resolution
        # volume round trip (measured 2.5 -> 1.2 ms).  f32 accumulation.
        pf = p.astype(jnp.float32)
        d_vals = jnp.arange(D, dtype=jnp.float32).reshape(1, D, 1, 1)
        num = jnp.sum(pf * d_vals, axis=1)
        den = jnp.maximum(jnp.sum(jnp.abs(pf), axis=1), 1e-6)
        return num / den


class CostAggregation(nn.Module):
    cfg: ModelConfig
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(
        self,
        cv: jnp.ndarray,
        guidance: dict,
        train: bool = False,
    ) -> List[jnp.ndarray]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        C = cfg.agg_channels
        levels = cfg.agg_levels
        cycles = cfg.agg_cycles
        chans = channel_schedule(C, levels)
        sg_full = list(guidance["sg_full"])
        sg_half = list(guidance["sg_half"])
        full_i = 0
        half_i = 0

        # Rematerialization: the SGA sweeps' saved residuals (4 directional
        # volumes + kernel carries per block) and the full-res head tensors
        # dominate training activation memory; cfg.remat trades them for
        # recompute in backward (lifted transform — parameter paths are
        # unchanged, only autodiff residuals).
        remat_blocks = cfg.remat in ("sga", "full")
        remat_convs = cfg.remat == "full"
        if cfg.remat not in ("none", "sga", "full"):
            raise ValueError(f"unknown remat policy {cfg.remat!r}")
        Sga = nn.remat(SGABlock, static_argnums=(3,)) if remat_blocks else SGABlock
        Head = nn.remat(DispHead, static_argnums=(2,)) if remat_blocks else DispHead
        AggHead = (
            nn.remat(DispAggHead, static_argnums=(4,))
            if remat_blocks
            else DispAggHead
        )
        # Explicit names pin the parameter paths to the unwrapped classes'
        # auto-names ("BasicConv_0", ...) so checkpoints are interchangeable
        # across remat policies (nn.remat's auto-name would otherwise be
        # "CheckpointBasicConv_0").
        _Bc = nn.remat(BasicConv, static_argnums=(2,)) if remat_convs else BasicConv
        _C2 = nn.remat(Conv2x, static_argnums=(3,)) if remat_convs else Conv2x
        counters = {"bc": 0, "c2": 0}

        def conv3(feats, stride=1, relu=True):
            name = f"BasicConv_{counters['bc']}"
            counters["bc"] += 1
            return _Bc(
                feats,
                3,
                stride=stride,
                is_3d=True,
                relu=relu,
                dtype=dtype,
                name=name,
            )

        def C2(*a, **kw):
            name = f"Conv2x_{counters['c2']}"
            counters["c2"] += 1
            return _C2(*a, **kw, name=name)

        def maybe_sga_full(x):
            nonlocal full_i
            if full_i < len(sg_full):
                x = Sga(
                    chans[0], cfg, mesh=self.mesh, name=f"sga_full{full_i}"
                )(x, sg_full[full_i], train)
                full_i += 1
                # Back to the conv-phase layout (disp re-sharded over
                # 'disp') after the sweep phase, per SURVEY.md §5: sweeps
                # keep D local, convs shard it.
                x = constrain_volume(x, self.mesh, cfg.channel_tp)
            return x

        def maybe_sga_half(x):
            nonlocal half_i
            if half_i < len(sg_half):
                x = Sga(
                    chans[1], cfg, mesh=self.mesh, name=f"sga_half{half_i}"
                )(x, sg_half[half_i], train)
                half_i += 1
                x = constrain_volume(x, self.mesh, cfg.channel_tp)
            return x

        outputs: List[jnp.ndarray] = []

        # Conv-phase sharding of the cost volume: batch over 'data',
        # disparity over 'disp', height over 'space' (SURVEY.md §5 — the
        # 3D convs shard D with kd=3 halo exchange handled by GSPMD; the
        # SGA shard_map re-shards to D-local around the sweeps).
        cv = constrain_volume(cv, self.mesh, cfg.channel_tp)
        x = conv3(C, relu=False)(cv, train)
        x = maybe_sga_full(x)
        if train:
            outputs.append(Head(cfg, mesh=self.mesh, name="disp0")(x, train))

        rem = [None] * (levels + 1)
        rem[0] = x
        # Initial descent.
        for i in range(levels):
            x = conv3(chans[i + 1], stride=2)(x, train)
            if i == 0:
                x = maybe_sga_half(x)
            rem[i + 1] = x
        for cycle in range(cycles):
            # Ascent.
            for i in range(levels, 0, -1):
                arriving_full = i - 1 == 0
                x = C2(
                    chans[i - 1],
                    deconv=True,
                    is_3d=True,
                    relu=not arriving_full,
                    dtype=dtype,
                )(x, rem[i - 1], train)
                if i - 1 == 1:
                    x = maybe_sga_half(x)
                rem[i - 1] = x
            x = maybe_sga_full(x)
            rem[0] = x
            last_cycle = cycle == cycles - 1
            if not last_cycle:
                if train:
                    outputs.append(
                        Head(cfg, mesh=self.mesh, name=f"disp{cycle + 1}")(x, train)
                    )
                # Re-descent.
                for i in range(levels):
                    x = C2(chans[i + 1], is_3d=True, dtype=dtype)(
                        x, rem[i + 1], train
                    )
                    if i == 0:
                        x = maybe_sga_half(x)
                    rem[i + 1] = x

        outputs.append(
            AggHead(cfg, mesh=self.mesh, name="disp_final")(
                x, guidance["lg1"], guidance["lg2"], train
            )
        )
        return outputs
