"""Shared-weight stacked-hourglass feature extractor.

Reference: `Feature` in models/GANet_deep.py (SURVEY.md §0 step 1, §2 #7):
a 2D CNN that maps an RGB image to a feature map with `feature_channels`
channels at 1/3 input resolution, through `feature_cycles` down/up
hourglass cycles with skip connections at every level.

For the deep preset (base 32 channels, 4 levels, 2 cycles) this reproduces
the reference schedule conv_start -> conv1a..4a -> deconv4a..1a ->
conv1b..4b -> deconv4b..1b with channel widths 32/48/64/96/128.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ganet_tpu.config import ModelConfig
from ganet_tpu.models.layers import BasicConv, Conv2x, channel_schedule


class FeatureNet(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        C = cfg.feature_channels
        levels = cfg.feature_levels
        chans = channel_schedule(C, levels)

        # Stem: full res -> 1/3 res (reference conv_start: 3x3 s1, 5x5 s3,
        # 3x3 s1).
        x = BasicConv(C, 3, dtype=dtype)(x, train)
        x = BasicConv(C, 5, stride=3, dtype=dtype)(x, train)
        x = BasicConv(C, 3, dtype=dtype)(x, train)

        rem = [None] * (levels + 1)
        rem[0] = x
        # Initial descent (plain stride-2 convs).
        for i in range(levels):
            x = BasicConv(chans[i + 1], 3, stride=2, dtype=dtype)(x, train)
            rem[i + 1] = x
        for cycle in range(cfg.feature_cycles):
            # Ascent with skip fusion.
            for i in range(levels, 0, -1):
                x = Conv2x(chans[i - 1], deconv=True, dtype=dtype)(
                    x, rem[i - 1], train
                )
                rem[i - 1] = x
            # Re-descent (skip-fused), except after the final ascent.
            if cycle < cfg.feature_cycles - 1:
                for i in range(levels):
                    x = Conv2x(chans[i + 1], dtype=dtype)(x, rem[i + 1], train)
                    rem[i + 1] = x
        return x
