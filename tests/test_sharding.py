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

    @pytest.mark.parametrize("chunks", [2, 4])
    def test_grads_match_unsharded_multichunk(self, rng, mesh4, chunks):
        """Backward through the multi-chunk wavefront pipeline (fori_loop +
        jnp.where masking + ppermute) — the production configuration."""
        B, D, H, W, C = 1, 4, 8, 12, 1
        x = jnp.asarray(rng.standard_normal((B, D, H, W, C)).astype(np.float32))
        w = l1_normalize(
            jnp.asarray(rng.standard_normal((B, H, W, C, 4, 5)).astype(np.float32)),
            axis=-1,
        )
        g_sh = jax.grad(
            lambda a, b: jnp.sum(sharded_sga(a, b, mesh4, chunks=chunks) ** 2),
            argnums=(0, 1),
        )(x, w)
        g_ref = jax.grad(
            lambda a, b: jnp.sum(sga_ref(a, b) ** 2), argnums=(0, 1)
        )(x, w)
        for a, b in zip(g_sh, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )

    @pytest.mark.parametrize("chunks", [2, 5])
    def test_wavefront_chunks_match_unsharded(self, rng, mesh4, chunks):
        # chunks > 1 exercises the true wavefront schedule (several chunks
        # in flight across shards), including a W not divisible by the
        # requested chunk count (5 -> ceil-width chunks, last overlapping).
        B, D, H, W, C = 1, 5, 8, 12, 2
        x = jnp.asarray(rng.standard_normal((B, D, H, W, C)).astype(np.float32))
        w = l1_normalize(
            jnp.asarray(rng.standard_normal((B, H, W, C, 4, 5)).astype(np.float32)),
            axis=-1,
        )
        want = np.asarray(sga_ref(x, w))
        got = np.asarray(sharded_sga(x, w, mesh4, chunks=chunks))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_pallas_local_sweeps_match_unsharded(self, rng, mesh4):
        """impl='pallas' inside shard_map: horizontal sweeps AND the seeded
        wavefront vertical sweeps run the Pallas kernels (interpret mode on
        CPU), forward + grads."""
        B, D, H, W, C = 1, 4, 8, 12, 1
        x = jnp.asarray(rng.standard_normal((B, D, H, W, C)).astype(np.float32))
        w = l1_normalize(
            jnp.asarray(rng.standard_normal((B, H, W, C, 4, 5)).astype(np.float32)),
            axis=-1,
        )
        want = np.asarray(sga_ref(x, w))
        got = np.asarray(sharded_sga(x, w, mesh4, chunks=2, impl="pallas"))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

        g_sh = jax.grad(
            lambda a, b: jnp.sum(
                sharded_sga(a, b, mesh4, chunks=2, impl="pallas") ** 2
            ),
            argnums=(0, 1),
        )(x, w)
        g_ref = jax.grad(
            lambda a, b: jnp.sum(sga_ref(a, b) ** 2), argnums=(0, 1)
        )(x, w)
        for a, b in zip(g_sh, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )

    def test_rejects_bad_weights(self, rng, mesh4):
        x = jnp.zeros((1, 4, 8, 6, 1))
        with pytest.raises(ValueError, match=r"\(4, 5\)"):
            sharded_sga(x, jnp.zeros((1, 8, 6, 1, 5, 4)), mesh4)

    def test_overlapping_tail_chunks_match_unsharded(self, rng, mesh4):
        """W=10 with chunks=3 -> ceil-width 4, starts (0, 4, 6): the last
        chunk OVERLAPS the previous one (columns are independent in a
        vertical sweep so recompute is exact) — forward and grads."""
        from ganet_tpu.parallel.sharded_sga import chunk_layout

        assert chunk_layout(10, 3) == (4, [0, 4, 6])
        B, D, H, W, C = 1, 4, 8, 10, 2
        x = jnp.asarray(rng.standard_normal((B, D, H, W, C)).astype(np.float32))
        w = l1_normalize(
            jnp.asarray(rng.standard_normal((B, H, W, C, 4, 5)).astype(np.float32)),
            axis=-1,
        )
        want = np.asarray(sga_ref(x, w))
        got = np.asarray(sharded_sga(x, w, mesh4, chunks=3))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        g_sh = jax.grad(
            lambda a, b: jnp.sum(sharded_sga(a, b, mesh4, chunks=3) ** 2),
            argnums=(0, 1),
        )(x, w)
        g_ref = jax.grad(
            lambda a, b: jnp.sum(sga_ref(a, b) ** 2), argnums=(0, 1)
        )(x, w)
        for a, b in zip(g_sh, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )

    def test_force_pipeline_single_shard_matches(self, rng):
        """force_pipeline=True runs the chunked wavefront machinery at S=1
        (the on-chip overhead-measurement mode, bench_wavefront
        --single_shard): numerics must be identical to the plain op."""
        mesh = make_mesh(MeshConfig(data=1, space=1, disp=1))
        B, D, H, W, C = 1, 6, 12, 10, 2
        x = jnp.asarray(rng.standard_normal((B, D, H, W, C)).astype(np.float32))
        w = l1_normalize(
            jnp.asarray(
                rng.standard_normal((B, H, W, C, 4, 5)).astype(np.float32)
            ),
            axis=-1,
        )
        want = np.asarray(sga_ref(x, w))
        got = np.asarray(
            sharded_sga(x, w, mesh, chunks=3, force_pipeline=True)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_pipeline_stats_fused_beats_unfused(self):
        """The fused tb/bt wavefront's critical path must beat two
        sequential pipelines, and the production-proportioned case (S=4,
        W=320 -> 3 lane-width chunks) must reach >= 70% utilization (the
        old divide-only 2-chunk schedule ran at 40%)."""
        from ganet_tpu.parallel.sharded_sga import chunk_layout, pipeline_stats

        Wc, starts = chunk_layout(320, 0)
        assert Wc == 128 and len(starts) == 3
        s = pipeline_stats(4, len(starts))
        assert s["critical_chunk_sweeps"] < s["unfused_chunk_sweeps"]
        assert s["utilization"] >= 0.70, s
        # Deep pipeline limit: utilization -> 1 as chunks >> shards.
        assert pipeline_stats(4, 64)["utilization"] > 0.9


class TestShardedLGA:
    """Full-res head distribution (VERDICT r2 missing #2): LGA as a
    radius-r halo-exchange shard_map over H."""

    def _data(self, rng, B=1, D=6, H=16, W=12):
        x = jnp.asarray(rng.standard_normal((B, D, H, W)).astype(np.float32))
        g = l1_normalize(
            jnp.asarray(rng.standard_normal((B, H, W, 75)).astype(np.float32)),
            axis=-1,
        )
        return x, g

    @pytest.mark.parametrize("impl", ["scan", "pallas"])
    @pytest.mark.parametrize("repeats", [1, 2])
    def test_matches_unsharded(self, rng, mesh4, impl, repeats):
        from ganet_tpu.ops.lga import lga as lga_ref
        from ganet_tpu.parallel.sharded_lga import sharded_lga

        x, g = self._data(rng)
        want = np.asarray(lga_ref(x, g, radius=2, repeats=repeats))
        got = np.asarray(
            sharded_lga(x, g, mesh4, radius=2, repeats=repeats, impl=impl)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_grads_match_unsharded(self, rng, mesh4):
        from ganet_tpu.ops.lga import lga as lga_ref
        from ganet_tpu.parallel.sharded_lga import sharded_lga

        x, g = self._data(rng)
        g_sh = jax.grad(
            lambda a, b: jnp.sum(sharded_lga(a, b, mesh4, repeats=2) ** 2),
            argnums=(0, 1),
        )(x, g)
        g_ref = jax.grad(
            lambda a, b: jnp.sum(lga_ref(a, b, repeats=2) ** 2),
            argnums=(0, 1),
        )(x, g)
        for a, b in zip(g_sh, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )

    def test_rejects_blocks_thinner_than_radius(self, mesh4):
        from ganet_tpu.parallel.sharded_lga import sharded_lga

        with pytest.raises(ValueError, match="row blocks"):
            sharded_lga(
                jnp.zeros((1, 4, 4, 8)), jnp.zeros((1, 4, 8, 75)), mesh4
            )

    def test_dispatch_falls_back_when_indivisible(self, rng, mesh4):
        """dispatch.lga with a mesh but an H that can't shard must still
        compute correctly (unsharded fallback, not an error)."""
        from ganet_tpu.ops import dispatch
        from ganet_tpu.ops.lga import lga as lga_ref

        x, g = self._data(rng, H=10)  # 10 % 4 != 0
        want = np.asarray(lga_ref(x, g))
        got = np.asarray(dispatch.lga(x, g, impl="scan", mesh=mesh4))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestModelSpatialSharding:
    """North-star config #5: the FULL model with the cost volume sharded
    over (space, disp) and SGA running the cross-shard wavefront pipeline
    (VERDICT round-1 item #1)."""

    def _setup(self, rng, mesh):
        from ganet_tpu.config import ganet_small
        from ganet_tpu.models import GANet
        from ganet_tpu.parallel.mesh import batch_sharding

        cfg = ganet_small(max_disp=24, sga_impl="scan")
        model_ref = GANet(cfg)
        model_sh = GANet(cfg, mesh=mesh)
        key = jax.random.PRNGKey(0)
        B = 2
        left = jnp.asarray(rng.standard_normal((B, 48, 96, 3)).astype(np.float32))
        right = jnp.asarray(rng.standard_normal((B, 48, 96, 3)).astype(np.float32))
        variables = model_ref.init(key, left, right, train=True)
        sh = batch_sharding(mesh)
        left_s = jax.device_put(left, sh)
        right_s = jax.device_put(right, sh)
        return model_ref, model_sh, variables, (left, right), (left_s, right_s)

    def test_forward_matches_unsharded(self, rng, mesh4):
        model_ref, model_sh, variables, (l, r), (ls, rs) = self._setup(
            rng, mesh4
        )
        want = np.asarray(
            jax.jit(lambda v, a, b: model_ref.apply(v, a, b, train=False))(
                variables, l, r
            )
        )
        got = np.asarray(
            jax.jit(lambda v, a, b: model_sh.apply(v, a, b, train=False))(
                variables, ls, rs
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_grads_match_unsharded(self, rng, mesh4):
        model_ref, model_sh, variables, (l, r), (ls, rs) = self._setup(
            rng, mesh4
        )
        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}

        def loss(model, p, a, b):
            out = model.apply({"params": p, **rest}, a, b, train=False)
            return jnp.mean(out**2)

        g_ref = jax.jit(jax.grad(lambda p: loss(model_ref, p, l, r)))(params)
        g_sh = jax.jit(jax.grad(lambda p: loss(model_sh, p, ls, rs)))(params)
        flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
        flat_sh = {
            jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_leaves_with_path(g_sh)
        }
        for k, v_ref in flat_ref:
            v_sh = flat_sh[jax.tree_util.keystr(k)]
            np.testing.assert_allclose(
                np.asarray(v_sh),
                np.asarray(v_ref),
                rtol=2e-4,
                atol=2e-4,
                err_msg=jax.tree_util.keystr(k),
            )

    def test_wavefront_pipeline_actually_executes(self, rng, mesh4, monkeypatch):
        """The sharded model must (a) route SGA through sharded_sga and
        (b) compile to a collective-permute pipeline, not a GSPMD
        all-gather around the scan."""
        from ganet_tpu.parallel import sharded_sga as ss_mod

        model_ref, model_sh, variables, _, (ls, rs) = self._setup(rng, mesh4)
        calls = []
        orig = ss_mod.sharded_sga

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(ss_mod, "sharded_sga", spy)
        fn = jax.jit(lambda v, a, b: model_sh.apply(v, a, b, train=False))
        compiled = fn.lower(variables, ls, rs).compile()
        # every SGA block routed through the pipeline
        from ganet_tpu.config import ganet_small

        cfg = ganet_small()
        assert len(calls) >= cfg.num_sga_full + cfg.num_sga_half
        text = compiled.as_text()
        assert "collective-permute" in text

    def test_pallas_model_dp_space_matches_unsharded(self, rng):
        """VERDICT r2 missing #2 'done' condition: FULL model forward +
        grads under (data=2, space=4) with sga_impl='pallas' (interpret on
        CPU) must match the unsharded scan model, and the compiled HLO must
        contain no all-gather of the full-resolution (B, D, H, W) head
        volume (the LGA halo shard_map + sharding constraints keep it
        H-sharded end to end)."""
        import re

        if jax.device_count() < 8:
            pytest.skip("needs >= 8 devices")
        from ganet_tpu.config import ganet_small
        from ganet_tpu.models import GANet

        mesh = make_mesh(MeshConfig(data=2, space=4, disp=1))
        cfg_ref = ganet_small(max_disp=24, sga_impl="scan")
        cfg_sh = ganet_small(max_disp=24, sga_impl="pallas")
        model_ref = GANet(cfg_ref)
        model_sh = GANet(cfg_sh, mesh=mesh)
        B = 2
        left = jnp.asarray(rng.standard_normal((B, 48, 96, 3)).astype(np.float32))
        right = jnp.asarray(rng.standard_normal((B, 48, 96, 3)).astype(np.float32))
        variables = model_ref.init(jax.random.PRNGKey(0), left, right, train=True)
        sh = batch_sharding(mesh)
        ls, rs = jax.device_put(left, sh), jax.device_put(right, sh)

        want = np.asarray(
            jax.jit(lambda v, a, b: model_ref.apply(v, a, b, train=False))(
                variables, left, right
            )
        )
        fn = jax.jit(lambda v, a, b: model_sh.apply(v, a, b, train=False))
        compiled = fn.lower(variables, ls, rs).compile()
        got = np.asarray(compiled(variables, ls, rs))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

        # No all-gather may produce the full-res volume (>= B*D*H*W elts).
        fullres = B * cfg_ref.max_disp * 48 * 96
        for line in compiled.as_text().splitlines():
            m = re.search(r"\[([\d,]+)\][^=]*\ball(?:-| )gather", line)
            if m:
                elts = np.prod([int(d) for d in m.group(1).split(",")])
                assert elts < fullres, f"full-res all-gather: {line.strip()}"

        # Grads parity through the pallas kernels' VJPs + halo pipelines.
        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}

        def loss(model, p, a, b):
            return jnp.mean(
                model.apply({"params": p, **rest}, a, b, train=False) ** 2
            )

        g_ref = jax.jit(jax.grad(lambda p: loss(model_ref, p, left, right)))(params)
        g_sh = jax.jit(jax.grad(lambda p: loss(model_sh, p, ls, rs)))(params)
        flat_sh = {
            jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_leaves_with_path(g_sh)
        }
        for k, v_ref in jax.tree_util.tree_leaves_with_path(g_ref):
            np.testing.assert_allclose(
                np.asarray(flat_sh[jax.tree_util.keystr(k)]),
                np.asarray(v_ref),
                rtol=2e-4,
                atol=2e-4,
                err_msg=jax.tree_util.keystr(k),
            )

    def test_disp_axis_actually_partitions(self):
        """VERDICT r2 missing #3 'done' condition: under a disp>1 mesh the
        conv-phase cost volume must be PARTITIONED over 'disp' in the
        compiled HLO — every 5D convolution runs at reduced local depth
        (GSPMD deciding to replicate would show full-depth convs) — and a
        (2,2,2) mesh must cut per-device temp memory accordingly."""
        import re

        if jax.device_count() < 8:
            pytest.skip("needs >= 8 devices")
        from ganet_tpu.config import ganet_small
        from ganet_tpu.models import GANet

        cfg = ganet_small(max_disp=24, sga_impl="scan")
        D3 = cfg.disp_channels  # 8
        B = 2
        left = jnp.ones((B, 48, 96, 3), jnp.float32)
        right = jnp.ones((B, 48, 96, 3), jnp.float32)
        model1 = GANet(cfg)
        v = model1.init(jax.random.PRNGKey(0), left, right, train=True)
        c1 = (
            jax.jit(lambda v, a, b: model1.apply(v, a, b, train=False))
            .lower(v, left, right)
            .compile()
        )
        temp1 = c1.memory_analysis().temp_size_in_bytes

        def compile_on(mesh_cfg):
            mesh = make_mesh(mesh_cfg)
            model = GANet(cfg, mesh=mesh)
            sh = batch_sharding(mesh)
            ls, rs = jax.device_put(left, sh), jax.device_put(right, sh)
            return (
                jax.jit(lambda v, a, b: model.apply(v, a, b, train=False))
                .lower(v, ls, rs)
                .compile()
            )

        # disp=2 only: every 5D conv operand/result depth < D3 (halo may
        # add up to kd-1=2 rows on the D3/2 local block).
        c_disp = compile_on(MeshConfig(data=1, space=1, disp=2))
        depths = set()
        for line in c_disp.as_text().splitlines():
            if " convolution(" in line:
                for g in re.findall(r"[a-z0-9]+\[([\d,]+)\]", line):
                    dims = [int(d) for d in g.split(",")]
                    if len(dims) == 5:
                        depths.add(dims[1])
        assert depths, "no 5D convolutions found in compiled HLO"
        assert max(depths) <= D3 // 2 + 2, (
            f"conv depths {sorted(depths)}: cost volume not partitioned"
            " over 'disp'"
        )

        # Full (2,2,2) mesh: per-device working set must actually shrink.
        c_all = compile_on(MeshConfig(data=2, space=2, disp=2))
        ratio = c_all.memory_analysis().temp_size_in_bytes / temp1
        assert ratio < 0.45, f"temp memory ratio {ratio}: sharding not real"

    def test_dp_space_disp_mesh_trains(self, rng):
        """(data=2, disp=2, space=2): one train step over all three mesh
        axes with finite loss (VERDICT round-1 item #5)."""
        if jax.device_count() < 8:
            pytest.skip("needs >= 8 devices")
        from ganet_tpu.config import (
            DataConfig,
            MeshConfig,
            TrainConfig,
            ganet_small,
        )
        from ganet_tpu.parallel.mesh import shard_batch
        from ganet_tpu.train.state import create_train_state
        from ganet_tpu.train.trainer import make_train_step

        mesh_cfg = MeshConfig(data=2, space=2, disp=2)
        cfg = TrainConfig(
            model=ganet_small(max_disp=24, sga_impl="scan"),
            data=DataConfig(crop_height=48, crop_width=96, kind="synthetic"),
            mesh=mesh_cfg,
            batch_size=2,
            save_path="/tmp/ganet_test_dsd",
        )
        mesh = make_mesh(mesh_cfg)
        from ganet_tpu.data.dataset import SyntheticStereoDataset

        ds = SyntheticStereoDataset(crop_height=48, crop_width=96, max_disp=24)
        batch = {
            k: np.stack([ds[i][k] for i in range(2)]) for k in ds[0]
        }
        with mesh:
            state = create_train_state(cfg, jax.random.PRNGKey(0), mesh=mesh)
        step = make_train_step(cfg, mesh)
        state, metrics = step(state, shard_batch(mesh, batch))
        assert np.isfinite(float(metrics["loss"]))


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


class TestIndivisibleBatch:
    def test_batch1_eval_on_data_mesh(self, rng):
        """Batch-1 inference on a (data=2, space=2) TRAINING mesh must run
        with the batch replicated (shard_map would otherwise reject
        B=1 % data=2) — the predict.py-after-distributed-training path."""
        if jax.device_count() < 4:
            pytest.skip("needs >= 4 devices")
        from ganet_tpu.config import ganet_small
        from ganet_tpu.models import GANet

        mesh = make_mesh(MeshConfig(data=2, space=2, disp=1))
        cfg = ganet_small(max_disp=24, sga_impl="scan")
        model = GANet(cfg, mesh=mesh)
        l = jnp.asarray(rng.standard_normal((1, 48, 96, 3)).astype(np.float32))
        r = jnp.asarray(rng.standard_normal((1, 48, 96, 3)).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), l, r, train=True)
        out = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False))(
            v, l, r
        )
        assert out.shape == (1, 48, 96)
        assert np.isfinite(np.asarray(out)).all()
        # parity vs the unsharded model
        want = GANet(cfg).apply(v, l, r, train=False)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), rtol=1e-4, atol=1e-4
        )

    def test_replicated_batch_grads_no_overcount(self, rng):
        """Gradients through the batch-REPLICATED sharded ops on a data>1
        mesh (batch_axis=None: the indivisible-batch fallback) must match
        the unsharded ops exactly — shard_map must not psum-overcount the
        replicated batch's cotangents (ADVICE r3 #3)."""
        if jax.device_count() < 4:
            pytest.skip("needs >= 4 devices")
        from ganet_tpu.ops.lga import lga as lga_ref
        from ganet_tpu.parallel.sharded_lga import sharded_lga

        mesh = make_mesh(MeshConfig(data=2, space=2, disp=1))
        B, D, H, W, C = 1, 4, 8, 6, 1
        x = jnp.asarray(rng.standard_normal((B, D, H, W, C)).astype(np.float32))
        w = l1_normalize(
            jnp.asarray(
                rng.standard_normal((B, H, W, C, 4, 5)).astype(np.float32)
            ),
            axis=-1,
        )
        g_sh = jax.grad(
            lambda a, b: jnp.sum(
                sharded_sga(a, b, mesh, batch_axis=None) ** 2
            ),
            argnums=(0, 1),
        )(x, w)
        g_ref = jax.grad(
            lambda a, b: jnp.sum(sga_ref(a, b) ** 2), argnums=(0, 1)
        )(x, w)
        for a, b in zip(g_sh, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )

        xl = jnp.asarray(rng.standard_normal((1, 4, 8, 6)).astype(np.float32))
        gl = l1_normalize(
            jnp.asarray(rng.standard_normal((1, 8, 6, 75)).astype(np.float32)),
            axis=-1,
        )
        gl_sh = jax.grad(
            lambda a, b: jnp.sum(
                sharded_lga(a, b, mesh, radius=2, batch_axis=None) ** 2
            ),
            argnums=(0, 1),
        )(xl, gl)
        gl_ref = jax.grad(
            lambda a, b: jnp.sum(lga_ref(a, b, radius=2) ** 2), argnums=(0, 1)
        )(xl, gl)
        for a, b in zip(gl_sh, gl_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )


class TestChannelTP:
    """Channel-wise tensor parallelism (SURVEY §2 census TP row): with
    ModelConfig.channel_tp, the 'disp' mesh axis shards the aggregation
    hourglass's conv CHANNELS instead of disparity bins."""

    def test_channel_tp_parity_and_annotation(self):
        if jax.device_count() < 2:
            pytest.skip("needs >= 2 devices")
        from ganet_tpu.config import ganet_small
        from ganet_tpu.models import GANet

        cfg = ganet_small(max_disp=24, sga_impl="scan")
        left = jnp.linspace(0, 1, 2 * 48 * 96 * 3, dtype=jnp.float32).reshape(
            2, 48, 96, 3
        )
        right = jnp.roll(left, 2, axis=2)
        base = GANet(cfg)
        v = base.init(jax.random.PRNGKey(0), left, right, train=True)
        out_ref = jax.jit(lambda v, a, b: base.apply(v, a, b, train=False))(
            v, left, right
        )

        import dataclasses

        mesh = make_mesh(MeshConfig(data=1, space=1, disp=2))
        tp_cfg = dataclasses.replace(cfg, channel_tp=True)
        model = GANet(tp_cfg, mesh=mesh)
        fn = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False))
        lowered = fn.lower(v, left, right)
        # The conv-phase volumes must carry the C-over-'disp' constraint
        # (5D sharding with the last axis split 2-ways) in the lowered
        # module; GSPMD then partitions each 3D conv's feature dim (the
        # disp-axis test above proves constraints of this form partition
        # for this model family).
        text = lowered.as_text()
        # Shardy or GSPMD spelling of "5D tensor, C over 'disp'".
        assert (
            '[{"data"}, {}, {"space"}, {}, {"disp"}]' in text
            or "[1,1,1,1,2]" in text
        ), "channel-TP sharding annotation missing"
        out_tp = fn(v, left, right)
        np.testing.assert_allclose(
            np.asarray(out_ref), np.asarray(out_tp), rtol=2e-4, atol=2e-4
        )

    def test_constrain_volume_channel_tp_divisibility(self):
        if jax.device_count() < 2:
            pytest.skip("needs >= 2 devices")
        from ganet_tpu.parallel.mesh import constrain_volume

        mesh = make_mesh(MeshConfig(data=1, space=1, disp=2))
        with mesh:
            # C=7 does not divide disp=2: constraint must no-op, not crash.
            x = jnp.zeros((1, 8, 6, 6, 7))
            y = jax.jit(lambda a: constrain_volume(a, mesh, True))(x)
            assert y.shape == x.shape
            # C=8 divides: constrained output keeps the value/shape.
            x = jnp.ones((1, 8, 6, 6, 8))
            y = jax.jit(lambda a: constrain_volume(a, mesh, True))(x)
            np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_channel_tp_train_step_matches_unsharded(self, rng, tmp_path):
        """One full train step (fwd + bwd + Adam + sync-BN) under a
        channel-TP mesh must reproduce the unsharded step's loss — the
        gradient path through the C-sharded convs and the sweep-phase
        re-shard is exact, not approximate."""
        if jax.device_count() < 2:
            pytest.skip("needs >= 2 devices")
        import dataclasses

        from ganet_tpu.config import (
            DataConfig,
            MeshConfig,
            OptimConfig,
            TrainConfig,
            ganet_small,
        )
        from ganet_tpu.data.dataset import SyntheticStereoDataset
        from ganet_tpu.parallel.mesh import shard_batch
        from ganet_tpu.train.state import create_train_state
        from ganet_tpu.train.trainer import make_train_step

        def run(mesh_cfg, channel_tp):
            cfg = TrainConfig(
                model=dataclasses.replace(
                    ganet_small(max_disp=24, sga_impl="scan"),
                    channel_tp=channel_tp,
                ),
                data=DataConfig(crop_height=48, crop_width=96, kind="synthetic"),
                optim=OptimConfig(lr=1e-3),
                mesh=mesh_cfg,
                batch_size=2,
                save_path=str(tmp_path),
            )
            mesh = make_mesh(mesh_cfg)
            ds = SyntheticStereoDataset(crop_height=48, crop_width=96, max_disp=24)
            batch = {k: np.stack([ds[i][k] for i in range(2)]) for k in ds[0]}
            with mesh:
                state = create_train_state(cfg, jax.random.PRNGKey(0), mesh=mesh)
            step = make_train_step(cfg, mesh)
            _, metrics = step(state, shard_batch(mesh, batch))
            return float(metrics["loss"])

        loss_ref = run(MeshConfig(data=1, space=1, disp=1), False)
        loss_tp = run(MeshConfig(data=1, space=1, disp=2), True)
        np.testing.assert_allclose(loss_tp, loss_ref, rtol=1e-5)
