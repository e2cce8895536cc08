import sys
from ganet_tpu.utils.platform import apply_platform_overrides, enable_compile_cache
apply_platform_overrides(); enable_compile_cache()
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ganet_tpu.models.layers import conv3d_via_2d
from ganet_tpu.utils.profiling import benchmark_fn_chained

Th = int(sys.argv[1]) if len(sys.argv) > 1 else 8

def make_kernel(Th, W, Cin, Cout, out_dtype):
    def kernel(xm_ref, xb_ref, wp_ref, out_ref, acc):
        e = pl.program_id(2)
        xt = jnp.concatenate([xm_ref[0, 0], xb_ref[0, 0]], axis=0)
        Wp = xt.shape[1]
        # (Th+2, Cin, Wp): channels on sublanes, W on lanes.
        xtT = jnp.swapaxes(xt, 1, 2)
        # dx shifts become whole-tile lane rolls (wrap lands beyond W).
        xr = [xtT if dx == 0 else pltpu.roll(xtT, (-dx) % Wp, 2) for dx in range(3)]
        rows = []
        for i in range(Th):
            A = jnp.concatenate(
                [xr[dx][i + dy] for dy in range(3) for dx in range(3)], axis=0
            )  # (9*Cin, Wp)
            ci = lax.dot_general(
                A, wp_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Wp, 3*Cout)
            rows.append(ci[:W])
        c = jnp.stack(rows, axis=0)  # (Th, W, 3*Cout)
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

def conv(x, kernel, out_dtype=jnp.bfloat16):
    B, D, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    E = D + 2
    Wp = W + 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    wp = kernel.transpose(1, 2, 3, 0, 4).reshape(9 * Cin, 3 * Cout).astype(x.dtype)
    out = pl.pallas_call(
        make_kernel(Th, W, Cin, Cout, jnp.dtype(out_dtype)),
        grid=(B, H // Th, E),
        in_specs=[
            pl.BlockSpec((1, 1, Th, Wp, Cin), lambda b, h, e: (b, e, h, 0, 0)),
            pl.BlockSpec((1, 1, 2, Wp, Cin), lambda b, h, e: (b, e, (h + 1) * Th // 2, 0, 0)),
            pl.BlockSpec((9 * Cin, 3 * Cout), lambda b, h, e: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, Th, W, Cout), lambda b, h, e: (b, e, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, E, H, W, Cout), jnp.dtype(out_dtype)),
        scratch_shapes=[pltpu.VMEM((3, Th, W, Cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, xp, wp)
    return out[:, 2:]

k1, k2 = jax.random.split(jax.random.PRNGKey(0))
x = jax.random.normal(k1, (1, 64, 192, 320, 64), jnp.bfloat16)
w = jax.random.normal(k2, (3, 3, 3, 64, 32), jnp.bfloat16)
f = jax.jit(lambda x: conv(x, w))
y = f(x)
ref = jax.jit(lambda x: conv3d_via_2d(x, w, 1, out_dtype=jnp.bfloat16))(x)
err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32))))
t_p = benchmark_fn_chained(f, x, iters_low=2, iters_high=4)
print(f'MODE=tmm Th={Th} err={err}  pallas {t_p*1e3:.2f} ms  (via2d 13.96, loop-kernel 16.9)')
