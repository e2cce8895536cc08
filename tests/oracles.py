"""Loop-based numpy oracles for the hot ops.

These transcribe the recurrences from SURVEY.md §0 (GA-Net paper eq. 5-7)
as literally as possible — slow, scalar, obviously-correct — and are the
ground truth that both the lax.scan ops and the Pallas kernels are tested
against (SURVEY.md §4 test strategy)."""

import numpy as np


def sga_sweep_oracle(x, w, axis, reverse):
    """x: (B, D, H, W, C); w: (B, H, W, C, 5). Literal recurrence."""
    B, D, H, W, C = x.shape
    out = np.zeros_like(x)
    L = H if axis == "h" else W
    order = range(L - 1, -1, -1) if reverse else range(L)
    for b in range(B):
        for c in range(C):
            prev = None  # (D,) aggregated previous pixel per perpendicular idx
            # iterate: for each position along the sweep, all perpendicular
            # positions are independent
            P = W if axis == "h" else H
            for p in range(P):
                prev = None
                for i in order:
                    if axis == "h":
                        xs = x[b, :, i, p, c]
                        ws = w[b, i, p, c]
                    else:
                        xs = x[b, :, p, i, c]
                        ws = w[b, p, i, c]
                    if prev is None:
                        cur = xs.copy()
                    else:
                        prev_dm1 = np.concatenate([[0.0], prev[:-1]])
                        prev_dp1 = np.concatenate([prev[1:], [0.0]])
                        cur = (
                            ws[0] * xs
                            + ws[1] * prev
                            + ws[2] * prev_dm1
                            + ws[3] * prev_dp1
                            + ws[4] * prev.max()
                        )
                    if axis == "h":
                        out[b, :, i, p, c] = cur
                    else:
                        out[b, :, p, i, c] = cur
                    prev = cur
    return out


def sga_oracle(x, weights):
    """weights: (B, H, W, C, 4, 5); max over the four directions."""
    outs = [
        sga_sweep_oracle(x, weights[..., 0, :], "w", False),
        sga_sweep_oracle(x, weights[..., 1, :], "w", True),
        sga_sweep_oracle(x, weights[..., 2, :], "h", False),
        sga_sweep_oracle(x, weights[..., 3, :], "h", True),
    ]
    return np.maximum.reduce(outs)


def lga_oracle(x, g, radius=2):
    """x: (B, D, H, W); g: (B, H, W, 3*K*K) laid out (k, dy, dx)."""
    B, D, H, W = x.shape
    K = 2 * radius + 1
    gk = g.reshape(B, H, W, 3, K, K)
    out = np.zeros_like(x)
    for b in range(B):
        for d in range(D):
            for h in range(H):
                for w_ in range(W):
                    acc = 0.0
                    for iy, dy in enumerate(range(-radius, radius + 1)):
                        for ix, dx in enumerate(range(-radius, radius + 1)):
                            q_h, q_w = h + dy, w_ + dx
                            if not (0 <= q_h < H and 0 <= q_w < W):
                                continue
                            acc += gk[b, h, w_, 0, iy, ix] * x[b, d, q_h, q_w]
                            if d - 1 >= 0:
                                acc += gk[b, h, w_, 1, iy, ix] * x[b, d - 1, q_h, q_w]
                            if d + 1 < D:
                                acc += gk[b, h, w_, 2, iy, ix] * x[b, d + 1, q_h, q_w]
                    out[b, d, h, w_] = acc
    return out


def cost_volume_oracle(left, right, num_disp):
    """left/right: (B, H, W, C) -> (B, D, H, W, 2C)."""
    B, H, W, C = left.shape
    out = np.zeros((B, num_disp, H, W, 2 * C), dtype=left.dtype)
    for d in range(num_disp):
        out[:, d, :, :, :C] = left
        if d == 0:
            out[:, d, :, :, C:] = right
        else:
            out[:, d, :, d:, C:] = right[:, :, :-d]
    return out
