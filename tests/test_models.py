"""Model shape / init / forward tests (SURVEY.md §4)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganet_tpu.config import ganet11, ganet_deep, ganet_small, model_config
from ganet_tpu.models import GANet


def _init_and_apply(cfg, H, W, train, B=1):
    model = GANet(cfg)
    rng = jax.random.PRNGKey(0)
    left = jnp.ones((B, H, W, 3), jnp.float32) * 0.1
    right = jnp.ones((B, H, W, 3), jnp.float32) * 0.2
    # Init in train mode so the deep-supervision head params exist (the
    # reference creates all modules in __init__ unconditionally).
    variables = model.init(rng, left, right, train=True)
    if train:
        out, updates = model.apply(
            variables, left, right, train=True, mutable=["batch_stats"]
        )
        return out, variables, updates
    return model.apply(variables, left, right, train=False), variables, None


class TestGANetSmall:
    def test_eval_forward_shape(self):
        cfg = ganet_small(max_disp=24)
        out, variables, _ = _init_and_apply(cfg, 48, 96, train=False)
        assert out.shape == (1, 48, 96)
        assert np.isfinite(np.asarray(out)).all()
        # The final head's signed LGA weights mean untrained output is not
        # strictly range-bound (same as the reference's DispAgg); sanity-check
        # magnitude only.
        assert float(jnp.abs(out).max()) < 2 * cfg.max_disp

    def test_train_forward_outputs(self):
        cfg = ganet_small(max_disp=24)
        outs, variables, updates = _init_and_apply(cfg, 48, 96, train=True)
        assert isinstance(outs, list) and len(outs) == cfg.num_outputs
        for o in outs:
            assert o.shape == (1, 48, 96)
            assert np.isfinite(np.asarray(o)).all()
        assert "batch_stats" in updates

    def test_invalid_shape_rejected(self):
        cfg = ganet_small(max_disp=24)
        with pytest.raises(ValueError, match="multiples of 48"):
            _init_and_apply(cfg, 50, 96, train=False)

    def test_softmax_sga_norm_runs_and_differs(self):
        # Both SGA weight normalizations (the open reference question —
        # ops/normalize.py) must produce finite, distinct outputs.
        out_l1, _, _ = _init_and_apply(
            ganet_small(max_disp=24, sga_norm="l1"), 48, 96, train=False
        )
        out_sm, _, _ = _init_and_apply(
            ganet_small(max_disp=24, sga_norm="softmax"), 48, 96, train=False
        )
        assert np.isfinite(np.asarray(out_sm)).all()
        assert not np.allclose(np.asarray(out_l1), np.asarray(out_sm))

    def test_grads_finite(self):
        cfg = ganet_small(max_disp=24)
        model = GANet(cfg)
        rng = jax.random.PRNGKey(0)
        left = jax.random.normal(rng, (1, 48, 96, 3))
        right = jax.random.normal(jax.random.PRNGKey(1), (1, 48, 96, 3))
        variables = model.init(rng, left, right, train=True)

        def loss_fn(params):
            outs, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                left,
                right,
                train=True,
                mutable=["batch_stats"],
            )
            return sum(jnp.mean(o**2) for o in outs)

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        # Every parameter should receive gradient signal somewhere.
        total = sum(float(jnp.abs(g).sum()) for g in leaves)
        assert total > 0


class TestPresets:
    def test_param_counts_ordered(self):
        # deep > 11 > small in parameter count.
        counts = {}
        for name, cfg in [
            ("small", ganet_small(max_disp=24)),
            ("11", ganet11(max_disp=24)),
            ("deep", ganet_deep(max_disp=24)),
        ]:
            model = GANet(cfg)
            variables = jax.eval_shape(
                lambda: model.init(
                    jax.random.PRNGKey(0),
                    jnp.ones((1, 48, 96, 3)),
                    jnp.ones((1, 48, 96, 3)),
                    train=False,
                )
            )
            counts[name] = sum(
                int(np.prod(x.shape))
                for x in jax.tree_util.tree_leaves(variables["params"])
            )
        assert counts["small"] < counts["11"] < counts["deep"]
        # GANet-deep should be in the single-digit-millions range like the
        # reference (~6.5M).
        assert 1e6 < counts["deep"] < 3e7, counts

    def test_model_config_lookup(self):
        assert model_config("GANet_deep").name == "GANet_deep"
        with pytest.raises(KeyError):
            model_config("nope")

    def test_ganet11_forward_train_and_eval(self):
        """GANet-11 exercised end-to-end, not just counted (VERDICT
        round-1 §2 #8): eval shape, train outputs (2 supervision heads for
        the single-cycle preset), finite values."""
        cfg = ganet11(max_disp=24)
        outs, _, updates = _init_and_apply(cfg, 48, 96, train=True)
        assert isinstance(outs, list) and len(outs) == cfg.num_outputs == 2
        for o in outs:
            assert o.shape == (1, 48, 96)
            assert np.isfinite(np.asarray(o)).all()
        out, _, _ = _init_and_apply(cfg, 48, 96, train=False)
        assert out.shape == (1, 48, 96)
        assert np.isfinite(np.asarray(out)).all()


class TestFastConv3d:
    def test_matches_lax_conv3d(self, rng):
        import jax.numpy as jnp
        from jax import lax

        from ganet_tpu.models.layers import conv3d_via_2d

        for stride, D in ((1, 6), (2, 6), (2, 7), (1, 1)):
            x = jnp.asarray(
                rng.standard_normal((2, D, 8, 9, 5)).astype(np.float32)
            )
            k = jnp.asarray(
                rng.standard_normal((3, 3, 3, 5, 4)).astype(np.float32)
            )
            want = lax.conv_general_dilated(
                x, k, (stride,) * 3, "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            got = conv3d_via_2d(x, k, stride)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
            ), (stride, D)

    def test_grads_flow(self, rng):
        import jax
        import jax.numpy as jnp

        from ganet_tpu.models.layers import conv3d_via_2d

        x = jnp.asarray(rng.standard_normal((1, 4, 6, 6, 3)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 2)).astype(np.float32))
        gx, gk = jax.grad(
            lambda a, b: jnp.sum(conv3d_via_2d(a, b) ** 2), argnums=(0, 1)
        )(x, k)
        assert np.isfinite(np.asarray(gx)).all()
        assert np.isfinite(np.asarray(gk)).all()

    def test_dsplit_matches_lax_conv3d(self, rng):
        """Depth-tap output packing (the heads' Cout=1 path) must equal the
        native 3D conv."""
        import jax.numpy as jnp
        from jax import lax

        from ganet_tpu.models.layers import conv3d_dsplit

        x = jnp.asarray(rng.standard_normal((2, 5, 8, 9, 6)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((3, 3, 3, 6, 1)).astype(np.float32))
        want = lax.conv_general_dilated(
            x, k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        got = conv3d_dsplit(x, k)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )


class TestFoldableBN:
    """FoldableBN must be a drop-in for nn.BatchNorm (same variable tree,
    same numerics both modes) and BasicConv's eval-time fold must equal the
    unfolded conv -> BN -> relu chain."""

    def test_matches_nn_batchnorm(self, rng):
        import flax.linen as nn
        import jax
        import jax.numpy as jnp

        from ganet_tpu.models.layers import FoldableBN

        key = jax.random.PRNGKey(1)
        x = jnp.asarray(
            rng.standard_normal((2, 4, 6, 5)).astype(np.float32) * 3 + 1
        )
        mine = FoldableBN(5)
        vm = mine.init(key, x, True)
        ym, um = mine.apply(vm, x, True, mutable=["batch_stats"])
        ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
        vr = ref.init(key, x)
        yr, ur = ref.apply(vr, x, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(yr), np.asarray(ym), rtol=1e-5, atol=1e-5
        )
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(ur["batch_stats"][k]),
                np.asarray(um["batch_stats"][k]),
                rtol=1e-5,
                atol=1e-5,
            )
        refe = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
        yre = refe.apply(
            {"params": vr["params"], "batch_stats": ur["batch_stats"]}, x
        )
        yme = mine.apply(
            {"params": vm["params"], "batch_stats": um["batch_stats"]}, x, False
        )
        np.testing.assert_allclose(
            np.asarray(yre), np.asarray(yme), rtol=1e-5, atol=1e-5
        )

    def test_axis_name_syncs_stats_under_shard_map(self, rng):
        """With axis_name set, shard_map'd train-mode FoldableBN over a
        2-way data mesh matches the unsharded global-batch computation
        (sync-BN; ADVICE r4 #3)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh, PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        from ganet_tpu.models.layers import FoldableBN

        key = jax.random.PRNGKey(1)
        # Per-shard distributions differ (scale 1 vs 3) so per-device
        # stats would NOT match global stats — the sync must be real.
        x = jnp.asarray(
            np.concatenate(
                [
                    rng.standard_normal((2, 4, 6, 5)).astype(np.float32),
                    3.0 * rng.standard_normal((2, 4, 6, 5)).astype(np.float32)
                    + 2.0,
                ]
            )
        )
        # Init with the axis-free twin (identical variable tree): pmean is
        # unbound outside shard_map.
        v = FoldableBN(5).init(key, x, True)
        y_ref, u_ref = FoldableBN(5).apply(v, x, True, mutable=["batch_stats"])
        mine = FoldableBN(5, axis_name="data")

        mesh = Mesh(np.array(jax.devices()[:2]), ("data",))

        @jax.jit
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P("data")),
            out_specs=(P("data"), P()),
        )
        def run(v, xs):
            y, u = mine.apply(v, xs, True, mutable=["batch_stats"])
            return y, u

        y_sm, u_sm = run(v, x)
        np.testing.assert_allclose(
            np.asarray(y_ref), np.asarray(y_sm), rtol=1e-5, atol=1e-5
        )
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(u_ref["batch_stats"][k]),
                np.asarray(u_sm["batch_stats"][k]),
                rtol=1e-5,
                atol=1e-5,
            )

    def test_basicconv_deconv_param_tree_stable(self, rng):
        """The deconv+BN path must keep nn.ConvTranspose/nn.BatchNorm's
        variable layout (checkpoint compatibility) — pinned because this
        path has now changed twice: round 4 folded the eval BN into the
        deconv kernel (FoldableConvTranspose), round 5 removed the fold
        after bisecting the flagship batch-4 inference regression
        (1073 -> 1268 ms) to exactly that change."""
        import jax
        import jax.numpy as jnp

        from ganet_tpu.models.layers import BasicConv

        key = jax.random.PRNGKey(0)
        x = jnp.asarray(
            rng.standard_normal((1, 4, 6, 8, 5)).astype(np.float32)
        )
        bc = BasicConv(
            3, stride=2, is_3d=True, deconv=True, relu=True,
            dtype=jnp.float32,
        )
        v = bc.init(key, x, True)
        assert set(v["params"]) == {"ConvTranspose_0", "BatchNorm_0"}
        assert set(v["batch_stats"]) == {"BatchNorm_0"}
        assert v["params"]["ConvTranspose_0"]["kernel"].shape == (4, 4, 4, 5, 3)

    def test_basicconv_fold_matches_unfolded(self, rng):
        import jax
        import jax.numpy as jnp

        from ganet_tpu.models.layers import BasicConv, FastConv3d, FoldableBN

        key = jax.random.PRNGKey(0)
        x = jnp.asarray(
            rng.standard_normal((2, 4, 6, 8, 3)).astype(np.float32)
        )
        bc = BasicConv(5, 3, is_3d=True, relu=True, dtype=jnp.float32)
        v = bc.init(key, x, True)
        # variable tree identical to the nn.BatchNorm-era layout
        assert set(v["params"]["BatchNorm_0"]) == {"scale", "bias"}
        assert set(v["batch_stats"]["BatchNorm_0"]) == {"mean", "var"}
        _, upd = bc.apply(v, x, True, mutable=["batch_stats"])
        v2 = {"params": v["params"], "batch_stats": upd["batch_stats"]}
        y_fold = bc.apply(v2, x, False)
        yc = FastConv3d(5, 3, dtype=jnp.float32).apply(
            {"params": v2["params"]["FastConv3d_0"]}, x
        )
        yb = FoldableBN(5).apply(
            {
                "params": v2["params"]["BatchNorm_0"],
                "batch_stats": v2["batch_stats"]["BatchNorm_0"],
            },
            yc,
            False,
        )
        np.testing.assert_allclose(
            np.asarray(y_fold),
            np.asarray(jnp.maximum(yb, 0)),
            rtol=2e-5,
            atol=2e-5,
        )


class TestRemat:
    def test_remat_policies_preserve_params_and_grads(self):
        """cfg.remat is a memory/recompute knob only: parameter paths,
        forward values, and gradients must be identical across policies
        (so checkpoints trained under one policy load under another)."""
        import dataclasses

        left = jax.random.normal(jax.random.PRNGKey(1), (1, 48, 96, 3))
        right = jax.random.normal(jax.random.PRNGKey(2), (1, 48, 96, 3))
        ref = None
        for policy in ("none", "sga", "full"):
            cfg = dataclasses.replace(ganet_small(max_disp=24), remat=policy)
            model = GANet(cfg)
            v = model.init(jax.random.PRNGKey(0), left, right, train=True)

            def loss(params):
                outs, _ = model.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    left, right, train=True, mutable=["batch_stats"],
                )
                return sum(jnp.mean(o) for o in outs)

            l, g = jax.value_and_grad(loss)(v["params"])
            paths = [
                "/".join(str(k.key) for k in p)
                for p, _ in jax.tree_util.tree_flatten_with_path(g)[0]
            ]
            gsum = float(
                sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))
            )
            if ref is None:
                ref = (paths, float(l), gsum)
            else:
                assert paths == ref[0], f"param paths changed under {policy}"
                assert float(l) == pytest.approx(ref[1], rel=1e-5), policy
                assert gsum == pytest.approx(ref[2], rel=1e-4), policy

    def test_unknown_remat_rejected(self):
        import dataclasses

        cfg = dataclasses.replace(ganet_small(max_disp=24), remat="bogus")
        with pytest.raises(ValueError, match="remat"):
            GANet(cfg).init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 48, 96, 3)),
                jnp.zeros((1, 48, 96, 3)),
                train=True,
            )
