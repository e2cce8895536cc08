"""Top-level GANet model.

Reference: `GANet` in models/GANet_deep.py / models/GANet11.py (SURVEY.md
§0, §2 #7-#8, §3.1 call stack):

    feature(left), feature(right)        shared-weight hourglass, 1/3 res
    guidance(left image, left features)  per-pixel SGA/LGA weights
    cost volume                          concat, (B, D/3, H/3, W/3, 2C)
    cost aggregation                     3D hourglass + SGA blocks
    disparity heads                      trilinear x3, soft-argmin

Deviation from the reference, chosen deliberately for TPU: the two feature
passes run as one batched call (left/right concatenated along batch) —
identical math for the convs, larger MXU batches, and BatchNorm statistics
over both views instead of per-view (documented; the reference's
DataParallel BN is per-replica anyway).

Train mode returns `agg_cycles + 1` disparity maps for deep supervision
(deep: 3, matching the reference's disp0/disp1/disp2 with loss weights
0.2/0.6/1.0); eval mode returns only the final map.
"""

from __future__ import annotations

from typing import List, Optional, Union

import flax.linen as nn
import jax.numpy as jnp
from jax.sharding import Mesh

from ganet_tpu.config import ModelConfig
from ganet_tpu.models.aggregation import CostAggregation
from ganet_tpu.models.feature import FeatureNet
from ganet_tpu.models.guidance import GuidanceNet
from ganet_tpu.models.layers import BasicConv
from ganet_tpu.ops.cost_volume import build_cost_volume


class GANet(nn.Module):
    """cfg: architecture preset.  mesh: optional (data, space, disp) device
    mesh — when given, the cost-aggregation stage runs spatially sharded
    (wavefront cross-shard SGA sweeps, disp-sharded convs); without it the
    model is mesh-agnostic and GSPMD handles any ambient sharding."""

    cfg: ModelConfig
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(
        self,
        left: jnp.ndarray,
        right: jnp.ndarray,
        train: bool = False,
    ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        if left.ndim != 4 or left.shape != right.shape:
            raise ValueError(
                f"expected matching (B,H,W,3) pairs, got {left.shape} vs"
                f" {right.shape}"
            )
        B, H, W, _ = left.shape
        cfg.validate_image_shape(H, W)

        left = left.astype(dtype)
        right = right.astype(dtype)

        # Shared-weight feature extraction, batched over both views.
        feats = FeatureNet(cfg, name="feature")(
            jnp.concatenate([left, right], axis=0), train
        )
        f_left, f_right = feats[:B], feats[B:]

        # Per-view projection convs (reference conv_x / conv_y — weights NOT
        # shared between views).
        f_left = BasicConv(
            cfg.feature_channels, 3, dtype=dtype, name="conv_x"
        )(f_left, train)
        f_right = BasicConv(
            cfg.feature_channels, 3, dtype=dtype, name="conv_y"
        )(f_right, train)

        guidance = GuidanceNet(cfg, name="guidance")(left, f_left, train)

        cv = build_cost_volume(f_left, f_right, cfg.disp_channels)

        outputs = CostAggregation(cfg, mesh=self.mesh, name="cost_agg")(
            cv, guidance, train
        )
        if train:
            return outputs
        return outputs[-1]
