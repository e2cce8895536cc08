import sys
from ganet_tpu.utils.platform import apply_platform_overrides, enable_compile_cache
apply_platform_overrides(); enable_compile_cache()
import jax, jax.numpy as jnp
import ganet_tpu.ops.conv3d_pallas as cp
from ganet_tpu.models.layers import conv3d_via_2d
from ganet_tpu.utils.profiling import benchmark_fn_chained
th = int(sys.argv[1]) if len(sys.argv) > 1 else 0
if th:
    cp._pick_th.__wrapped__ if hasattr(cp._pick_th,'__wrapped__') else None
    cp._pick_th = lambda H, _th=th: _th if H % _th == 0 else 0
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
x = jax.random.normal(k1, (1, 64, 192, 320, 64), jnp.bfloat16)
w = jax.random.normal(k2, (3, 3, 3, 64, 32), jnp.bfloat16)
f = jax.jit(lambda x: cp.conv3d_pallas(x, w, out_dtype=jnp.bfloat16))
y = f(x)
ref = jax.jit(lambda x: conv3d_via_2d(x, w, 1, out_dtype=jnp.bfloat16))(x)
err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32))))
print('parity max abs err:', err)
t_p = benchmark_fn_chained(f, x, iters_low=2, iters_high=4)
print(f'Th={th or "auto"} pallas {t_p*1e3:.2f} ms  (via2d 13.96)')
