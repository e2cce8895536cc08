"""Distribution tests on a faked 8-device CPU mesh (SURVEY.md §4
"Distributed tests without a cluster")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ganet_tpu.config import MeshConfig
from ganet_tpu.ops import l1_normalize
from ganet_tpu.ops.sga import sga as sga_ref
from ganet_tpu.parallel.mesh import batch_sharding, make_mesh
from ganet_tpu.parallel.sharded_sga import sharded_sga


@pytest.fixture(scope="module")
def mesh4():
    if jax.device_count() < 4:
        pytest.skip("needs >= 4 devices")
    return make_mesh(MeshConfig(data=1, space=4, disp=1))


class TestShardedSGA:
    def test_matches_unsharded(self, rng, mesh4):
        B, D, H, W, C = 1, 6, 16, 10, 2  # H divisible by 4 shards
        x = jnp.asarray(rng.standard_normal((B, D, H, W, C)).astype(np.float32))
        w = l1_normalize(
            jnp.asarray(rng.standard_normal((B, H, W, C, 4, 5)).astype(np.float32)),
            axis=-1,
        )
        want = np.asarray(sga_ref(x, w))
        got = np.asarray(sharded_sga(x, w, mesh4))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_grads_match_unsharded(self, rng, mesh4):
        B, D, H, W, C = 1, 4, 8, 6, 1
        x = jnp.asarray(rng.standard_normal((B, D, H, W, C)).astype(np.float32))
        w = l1_normalize(
            jnp.asarray(rng.standard_normal((B, H, W, C, 4, 5)).astype(np.float32)),
            axis=-1,
        )
        g_sh = jax.grad(lambda a, b: jnp.sum(sharded_sga(a, b, mesh4) ** 2), argnums=(0, 1))(x, w)
        g_ref = jax.grad(lambda a, b: jnp.sum(sga_ref(a, b) ** 2), argnums=(0, 1))(x, w)
        for a, b in zip(g_sh, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )

    @pytest.mark.parametrize("chunks", [2, 5])
    def test_wavefront_chunks_match_unsharded(self, rng, mesh4, chunks):
        # chunks > 1 exercises the true wavefront schedule (several chunks
        # in flight across shards), including a W not divisible by the
        # requested chunk count (5 -> falls back to a divisor).
        B, D, H, W, C = 1, 5, 8, 12, 2
        x = jnp.asarray(rng.standard_normal((B, D, H, W, C)).astype(np.float32))
        w = l1_normalize(
            jnp.asarray(rng.standard_normal((B, H, W, C, 4, 5)).astype(np.float32)),
            axis=-1,
        )
        want = np.asarray(sga_ref(x, w))
        got = np.asarray(sharded_sga(x, w, mesh4, chunks=chunks))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_rejects_bad_weights(self, rng, mesh4):
        x = jnp.zeros((1, 4, 8, 6, 1))
        with pytest.raises(ValueError, match=r"\(4, 5\)"):
            sharded_sga(x, jnp.zeros((1, 8, 6, 1, 5, 4)), mesh4)


class TestDataParallelEquivalence:
    def test_sharded_forward_matches_single_device(self, rng):
        """Same jitted computation under batch sharding vs replicated must
        agree (grad-psum / sync-BN style equivalence at the op level)."""
        mesh = make_mesh(MeshConfig(data=4, space=1, disp=1))
        x = jnp.asarray(rng.standard_normal((8, 6, 6, 3)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((3, 3, 3, 4)).astype(np.float32))

        def f(x, k):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            # batch statistics — forces a cross-shard reduction under SPMD
            return y - y.mean(axis=0, keepdims=True)

        want = np.asarray(jax.jit(f)(x, k))
        sh = batch_sharding(mesh)
        xs = jax.device_put(x, sh)
        got = np.asarray(
            jax.jit(f, in_shardings=(sh, None), out_shardings=sh)(xs, k)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
