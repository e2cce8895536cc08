"""Concatenation cost volume.

Reference: `GetCostVolume` in libGANet/module/GANet.py (SURVEY.md §2 #6):
for each candidate disparity d in [0, D) at 1/3 resolution, concatenate the
left feature map with the right feature map shifted right by d (zero-filled
where the shift falls outside the image):

    cv[b, d, h, w] = concat(left[b, h, w], right[b, h, w - d])

TPU-first design notes: channels-last layout (B, D, H, W, C) so the channel
axis rides the 128-lane dimension; the shifted stack is produced by a
`lax.scan` of D cheap pad-and-slice copies (total bytes moved == output
size, i.e. bandwidth-optimal) instead of a gather, which XLA lowers poorly
on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def build_cost_volume(
    left: jnp.ndarray, right: jnp.ndarray, num_disp: int
) -> jnp.ndarray:
    """Build the 4D concat cost volume.

    Args:
      left, right: feature maps, shape (B, H, W, C), channels last.
      num_disp: number of disparity candidates D (max_disp // 3 at 1/3 res).

    Returns:
      (B, D, H, W, 2C) volume; cv[:, d, :, :, :C] = left,
      cv[:, d, :, :, C:] = right shifted right by d (zeros out of range).
    """
    if left.ndim != 4:
        raise ValueError(f"expected (B,H,W,C) features, got {left.shape}")

    def shift_once(carry, _):
        # carry[w] -> carry[w-1] with zero fill at w=0.
        shifted = jnp.pad(carry[:, :, :-1, :], ((0, 0), (0, 0), (1, 0), (0, 0)))
        return shifted, shifted

    if num_disp > 1:
        _, shifted = lax.scan(shift_once, right, None, length=num_disp - 1)
        # (D-1, B, H, W, C) -> (B, D-1, H, W, C)
        shifted = jnp.moveaxis(shifted, 0, 1)
        right_stack = jnp.concatenate([right[:, None], shifted], axis=1)
    else:
        right_stack = right[:, None]

    left_stack = jnp.broadcast_to(
        left[:, None], (left.shape[0], num_disp) + left.shape[1:]
    )
    return jnp.concatenate([left_stack, right_stack], axis=-1)
