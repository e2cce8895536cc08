"""Fused Pallas TPU kernel for the stride-1 3x3x3 'SAME' convolution.

The aggregation hourglass's stride-1 3D convolutions are the dominant cost
of GANet-deep inference (README roofline: ~55% of the pair).  XLA's best
lowering (conv3d_via_2d, models/layers.py) reads the input volume once per
depth tap and runs each 2D conv as a Cout-lane matmul — at Cout=32 that is
a quarter of the 128 MXU lanes.  This kernel restructures the conv so one
pass over the input produces the full output:

* **Depth-packed weights.** The (3,3,3,Cin,Cout) kernel is reshaped to
  nine (Cin, 3*Cout) matrices — one per in-plane tap (dy, dx) — with the
  three *depth* taps packed into the output lanes (N = 3*Cout: 96 lanes
  for the model's 32-channel volumes instead of 32).
* **Nine accumulated matmuls per input slice.** For each in-plane tap the
  kernel slices the shifted (Th, W, Cin) window out of the haloed row tile
  and runs a (Th*W, Cin) x (Cin, 3*Cout) MXU matmul, producing this
  slice's contribution to output depths e-1, e, e+1 simultaneously.
* **Rolling accumulator.** A 3-slot f32 VMEM accumulator sums the three
  depth-tap contributions across consecutive grid steps (depth innermost)
  and emits output slice e-2 at step e — the input volume is read from HBM
  exactly once and the output written exactly once (the tap-loop lowering
  reads x three times and round-trips a partial accumulator).
* **Halo via block specs.** Rows are tiled over H; the two extra bottom
  rows each tile needs arrive as a second (2-row-block) spec over the same
  padded array, so the H zero-pad rows double as edge halos and Pallas'
  automatic pipelining covers the prefetch (no manual DMA).

Semantics oracle: conv3d_via_2d / lax.conv_general_dilated (reference: the
3D convs of models/GANet_deep.py CostAggregation — there cuDNN's job, here
a hand kernel because XLA's conv emitter reaches only ~30 TFLOP/s at these
32-channel shapes; measured in scripts/bench_conv3d.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _pick_th(H: int) -> int:
    for th in (8, 16, 12, 4, 6, 2):
        if H % th == 0:
            return th
    return 0


def supported(x_shape, kernel_shape, stride: int) -> bool:
    """True when the fused kernel handles this conv (else use XLA)."""
    if stride != 1 or tuple(kernel_shape[:3]) != (3, 3, 3):
        return False
    B, D, H, W, Cin = x_shape
    return _pick_th(H) != 0 and W % 8 == 0 and W >= 8 and D >= 2


def _make_kernel_im2col(Th: int, W: int, Cin: int, Cout: int, out_dtype):
    """im2col variant: ONE (Th*W, 9*Cin) x (9*Cin, 3*Cout) MXU matmul per
    grid step instead of nine K=Cin matmuls.  K = 9*Cin (288/576 at the
    model's widths) fills the MXU contraction dim at ~90% vs 25-50% for
    K=Cin; the patch build costs 9 VMEM-to-VMEM tile copies, which the
    matmul win must beat (measured on-chip in scripts/bench_conv3d.py)."""

    def kernel(xm_ref, xb_ref, wp_ref, out_ref, acc):
        e = pl.program_id(2)

        xt = jnp.concatenate([xm_ref[0, 0], xb_ref[0, 0]], axis=0)
        # (Th*W, 9*Cin) patches, lane order (dy, dx, c) matching
        # _pack_weights_im2col.
        patches = jnp.concatenate(
            [
                xt[dy : dy + Th, dx : dx + W].reshape(Th * W, Cin)
                for dy in range(3)
                for dx in range(3)
            ],
            axis=-1,
        )
        c = jnp.dot(
            patches, wp_ref[:], preferred_element_type=jnp.float32
        ).reshape(Th, W, 3 * Cout)

        j0 = e % 3
        acc[j0] = c[:, :, :Cout]

        @pl.when(e >= 1)
        def _():
            j1 = (e + 2) % 3
            acc[j1] = acc[j1] + c[:, :, Cout : 2 * Cout]

        @pl.when(e >= 2)
        def _():
            j2 = (e + 1) % 3
            out_ref[0, 0] = (acc[j2] + c[:, :, 2 * Cout :]).astype(out_dtype)

    return kernel


def _pack_weights_im2col(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,Cin,Cout) DHWIO -> (9*Cin, 3*Cout): rows ordered (dy, dx, c),
    depth taps packed into the output lanes (same N packing as
    _pack_weights)."""
    kd, kh, kw, Cin, Cout = kernel.shape
    # (dy, dx, c) x (dz, Cout)
    return kernel.transpose(1, 2, 3, 0, 4).reshape(kh * kw * Cin, kd * Cout)


def _make_kernel(Th: int, W: int, Cin: int, Cout: int, out_dtype):
    def kernel(xm_ref, xb_ref, wp_ref, out_ref, acc):
        e = pl.program_id(2)

        # (Th+2, Wp, Cin) haloed row tile: Th main rows + 2 bottom rows.
        xt = jnp.concatenate([xm_ref[0, 0], xb_ref[0, 0]], axis=0)

        # Hoist the three W-shifts (sublane relayouts) out of the dy loop —
        # row slices on the untiled leading dim are free.
        xs = [xt[:, dx : dx + W] for dx in range(3)]

        # Tap order (dy, dx) matches the weight packing in _pack_weights.
        c = None
        for dy in range(3):
            for dx in range(3):
                part = xs[dx][dy : dy + Th].reshape(Th * W, Cin)
                o = jnp.dot(
                    part,
                    wp_ref[dy * 3 + dx],
                    preferred_element_type=jnp.float32,
                )
                c = o if c is None else c + o
        c = c.reshape(Th, W, 3 * Cout)

        # acc slot j holds the running sum for the output depth congruent
        # to j (mod 3): step e starts output e (tap 0), adds tap 1 to
        # output e-1, and finishes output e-2 with tap 2.
        j0 = e % 3
        acc[j0] = c[:, :, :Cout]

        @pl.when(e >= 1)
        def _():
            j1 = (e + 2) % 3
            acc[j1] = acc[j1] + c[:, :, Cout : 2 * Cout]

        @pl.when(e >= 2)
        def _():
            j2 = (e + 1) % 3
            out_ref[0, 0] = (acc[j2] + c[:, :, 2 * Cout :]).astype(out_dtype)

    return kernel


def _pack_weights(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,Cin,Cout) DHWIO -> (9, Cin, 3*Cout): one (Cin, 3*Cout) matrix
    per in-plane tap (dy, dx), depth taps packed into the output lanes."""
    kd, kh, kw, Cin, Cout = kernel.shape
    return kernel.transpose(1, 2, 3, 0, 4).reshape(kh * kw, Cin, kd * Cout)


@functools.partial(jax.jit, static_argnames=("out_dtype", "variant"))
def conv3d_pallas(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    out_dtype=jnp.float32,
    variant: str = "taps",
) -> jnp.ndarray:
    """Stride-1 'SAME' 3x3x3 convolution, fused single-pass Pallas kernel.

    Args:
      x: (B, D, H, W, Cin).
      kernel: (3, 3, 3, Cin, Cout) DHWIO (nn.Conv layout).
      variant: "taps" (nine K=Cin matmuls) or "im2col" (one K=9*Cin matmul
        over lane-concatenated patches).
    Returns:
      (B, D, H, W, Cout) in out_dtype.  Matmul accumulation is f32; the
      cross-depth accumulator is f32 regardless of out_dtype.
    """
    B, D, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    Th = _pick_th(H)
    if Th == 0 or W % 8:
        raise ValueError(f"unsupported (H={H}, W={W}) for conv3d_pallas")
    E = D + 2
    Wp = W + 2

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    if variant == "im2col":
        body = _make_kernel_im2col(Th, W, Cin, Cout, jnp.dtype(out_dtype))
        wp = _pack_weights_im2col(kernel).astype(x.dtype)
        w_spec = pl.BlockSpec(
            (9 * Cin, 3 * Cout),
            lambda b, h, e: (0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        body = _make_kernel(Th, W, Cin, Cout, jnp.dtype(out_dtype))
        wp = _pack_weights(kernel).astype(x.dtype)
        w_spec = pl.BlockSpec(
            (9, Cin, 3 * Cout),
            lambda b, h, e: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        body,
        grid=(B, H // Th, E),
        in_specs=[
            # Main Th-row tile: padded rows [h*Th, h*Th+Th).
            pl.BlockSpec(
                (1, 1, Th, Wp, Cin),
                lambda b, h, e: (b, e, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # Bottom halo: padded rows [(h+1)*Th, (h+1)*Th+2) in 2-row
            # blocks (Th is even).  The H zero-pad row serves as the last
            # tile's halo.
            pl.BlockSpec(
                (1, 1, 2, Wp, Cin),
                lambda b, h, e: (b, e, (h + 1) * Th // 2, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            w_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, 1, Th, W, Cout),
            # output depth e-2 lands at padded index e (sliced below); the
            # first two steps write partial sums into the pad slices.
            lambda b, h, e: (b, e, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, E, H, W, Cout), jnp.dtype(out_dtype)
        ),
        scratch_shapes=[
            pltpu.VMEM((3, Th, W, Cout), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(xp, xp, wp)
    return out[:, 2:]
