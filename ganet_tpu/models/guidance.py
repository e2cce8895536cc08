"""Guidance subnet: per-pixel SGA/LGA weight generation.

Reference: `Guidance` in models/GANet_deep.py (SURVEY.md §0 step 3, §2 #7):
a 2D CNN over the (left) image that emits
  * one 4*5*C-channel weight map per SGA block — 640 channels for the
    C=32 full-resolution (1/3) blocks, 960 for the C=48 half (1/6) blocks
    (weight_sg1..3 / weight_sg11..14 in the reference), and
  * two 75-channel (3 x 5 x 5) LGA weight maps at full image resolution
    (weight_lg1/lg2).
Weight maps are emitted raw; L1 normalization over the 5-weight (SGA) / 75
(LGA) axis happens at the point of use, as in the reference's SGABlock /
DispAgg.

The trunk is refined between heads so later SGA blocks see deeper guidance
features, mirroring the reference's interleaved head layout.
"""

from __future__ import annotations

from typing import Dict, List

import flax.linen as nn
import jax.numpy as jnp

from ganet_tpu.config import ModelConfig
from ganet_tpu.models.layers import BasicConv


class GuidanceNet(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self, image: jnp.ndarray, feat: jnp.ndarray, train: bool = False
    ) -> Dict[str, object]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        C_full = cfg.agg_channels
        C_half = max(1, int(1.5 * cfg.agg_channels))
        K = 2 * cfg.lga_radius + 1

        def head(x, channels, name):
            # Raw weight map: plain conv, no BN/ReLU (normalization is done
            # at the point of use).
            return nn.Conv(
                channels,
                (3, 3),
                padding="SAME",
                use_bias=False,
                dtype=dtype,
                kernel_init=nn.initializers.he_normal(),
                name=name,
            )(x)

        # Full-resolution stem over the raw image.
        g = BasicConv(16, 3, dtype=dtype)(image, train)
        g = BasicConv(16, 3, dtype=dtype)(g, train)

        # LGA guidance at full resolution (DispAgg consumes these).
        lg_trunk = BasicConv(16, 3, dtype=dtype)(g, train)
        lg1 = head(lg_trunk, 3 * K * K, "weight_lg1")
        lg2 = head(lg_trunk, 3 * K * K, "weight_lg2")

        # 1/3-resolution trunk, fused with the shared feature map.
        x = BasicConv(C_full, 5, stride=3, dtype=dtype)(g, train)
        x = jnp.concatenate([x, feat.astype(x.dtype)], axis=-1)
        x = BasicConv(C_full, 3, dtype=dtype)(x, train)

        sg_full: List[jnp.ndarray] = []
        for i in range(cfg.num_sga_full):
            x = BasicConv(C_full, 3, dtype=dtype)(x, train)
            sg_full.append(head(x, 4 * 5 * C_full, f"weight_sg{i + 1}"))

        # 1/6-resolution trunk for the half-resolution SGA blocks.
        sg_half: List[jnp.ndarray] = []
        if cfg.num_sga_half:
            y = BasicConv(C_half, 3, stride=2, dtype=dtype)(x, train)
            for i in range(cfg.num_sga_half):
                y = BasicConv(C_half, 3, dtype=dtype)(y, train)
                sg_half.append(head(y, 4 * 5 * C_half, f"weight_sg1{i + 1}"))

        return {"sg_full": sg_full, "sg_half": sg_half, "lg1": lg1, "lg2": lg2}
