"""Training loop tests: loss/metrics, one-step integration, overfit,
checkpoint resume (SURVEY.md §4 "End-to-end smoke")."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ganet_tpu.config import (
    DataConfig,
    MeshConfig,
    OptimConfig,
    TrainConfig,
    ganet_small,
)
from ganet_tpu.train.loss import deep_supervision_loss, smooth_l1_loss
from ganet_tpu.train.metrics import disparity_metrics


class TestLoss:
    def test_smooth_l1_regions(self):
        pred = jnp.array([[[0.5, 3.0]]])  # |diff| 0.5 (quadratic), 3 (linear)
        tgt = jnp.zeros((1, 1, 2))
        valid = jnp.ones((1, 1, 2))
        # 0.5*0.25 = 0.125 and 3-0.5 = 2.5 -> mean 1.3125
        assert float(smooth_l1_loss(pred, tgt, valid)) == pytest.approx(1.3125)

    def test_masking(self):
        pred = jnp.array([[[100.0, 1.0]]])
        tgt = jnp.zeros((1, 1, 2))
        valid = jnp.array([[[0.0, 1.0]]])
        assert float(smooth_l1_loss(pred, tgt, valid)) == pytest.approx(0.5)

    def test_no_valid_pixels_is_zero(self):
        pred = jnp.ones((1, 2, 2))
        assert float(
            smooth_l1_loss(pred, jnp.zeros_like(pred), jnp.zeros_like(pred))
        ) == 0.0

    def test_deep_supervision_weight_trim(self):
        pred = [jnp.ones((1, 2, 2)), jnp.ones((1, 2, 2))]
        tgt = jnp.zeros((1, 2, 2))
        valid = jnp.ones((1, 2, 2))
        # weights (0.2, 0.6, 1.0) trimmed to (0.6, 1.0); sL1(1)=0.5
        got = float(deep_supervision_loss(pred, tgt, valid, (0.2, 0.6, 1.0)))
        assert got == pytest.approx(0.5 * 1.6)


class TestMetrics:
    def test_epe_and_rates(self):
        pred = jnp.array([[[1.0, 5.0, 0.0, 0.0]]])
        tgt = jnp.array([[[0.0, 0.0, 0.0, 100.0]]])
        valid = jnp.array([[[1.0, 1.0, 1.0, 0.0]]])
        m = disparity_metrics(pred, tgt, valid)
        assert float(m["epe"]) == pytest.approx(2.0)
        assert float(m["rate_3px"]) == pytest.approx(1 / 3)
        assert float(m["rate_1px"]) == pytest.approx(1 / 3)

    def test_d1_needs_relative_error(self):
        # err 4px but gt 100 -> 4% < 5% -> not a D1 outlier
        pred = jnp.array([[[104.0]]])
        tgt = jnp.array([[[100.0]]])
        valid = jnp.ones((1, 1, 1))
        m = disparity_metrics(pred, tgt, valid)
        assert float(m["d1_all"]) == 0.0
        assert float(m["rate_3px"]) == 1.0


def _tiny_cfg(tmp_path, steps=2, epochs=1, mesh=MeshConfig()):
    return TrainConfig(
        model=ganet_small(max_disp=24),
        data=DataConfig(
            crop_height=48, crop_width=96, kind="synthetic", shuffle=True,
            num_prefetch=0,
        ),
        optim=OptimConfig(lr=3e-4),
        mesh=mesh,
        batch_size=2,
        num_epochs=epochs,
        steps_per_epoch=steps,
        save_path=str(tmp_path / "ckpt"),
        log_every=1,
        keep_checkpoints=2,
    )


class TestOptimizer:
    def test_step_decay_schedule(self):
        """Reference KITTI fine-tune drops lr 10x at a given epoch
        (SURVEY.md §2 #12): the optax schedule must reflect it."""
        from ganet_tpu.config import OptimConfig
        from ganet_tpu.train.state import make_optimizer

        import optax

        opt = make_optimizer(
            OptimConfig(lr=1e-3, decay_epoch=2, decay_factor=0.1),
            steps_per_epoch=10,
        )
        state = opt.init({"w": jnp.zeros(3)})
        # walk steps; optax adam uses the schedule internally — probe via
        # the injected hyperparams if present, else apply updates and check
        # the magnitude ratio before/after the boundary.
        grads = {"w": jnp.ones(3)}
        lr_effective = []
        params = {"w": jnp.zeros(3)}
        for step in range(30):
            updates, state = opt.update(grads, state, params)
            lr_effective.append(float(jnp.abs(updates["w"][0])))
        # adam's unit-gradient step magnitude ~ lr; after epoch 2 (step 20)
        # it must shrink ~10x.
        before = np.median(lr_effective[5:15])
        after = np.median(lr_effective[25:30])
        assert after < before * 0.2, (before, after)

    def test_constrain_volume_skips_indivisible(self):
        from ganet_tpu.parallel.mesh import constrain_volume, make_mesh
        from ganet_tpu.config import MeshConfig

        mesh = make_mesh(MeshConfig(data=2, space=2, disp=2))
        # D=3 not divisible by disp=2: must be a safe no-op, not an error.
        x = jnp.zeros((2, 3, 4, 4, 1))
        y = constrain_volume(x, mesh)
        assert y.shape == x.shape
        assert constrain_volume(x, None) is x


class TestTrainer:
    def test_one_epoch_runs_and_saves(self, tmp_path):
        from ganet_tpu.train.trainer import Trainer

        cfg = _tiny_cfg(tmp_path)
        t = Trainer(cfg)
        state = t.fit()
        assert int(state.step) == 2
        assert t.ckpt_mgr.latest_step() == 0

    def test_resume_continues(self, tmp_path):
        from ganet_tpu.train.trainer import Trainer

        cfg = _tiny_cfg(tmp_path, epochs=1)
        Trainer(cfg).fit()
        # New trainer picks up the saved epoch and continues to epoch 2.
        cfg2 = _tiny_cfg(tmp_path, epochs=2)
        t2 = Trainer(cfg2)
        assert t2.start_epoch == 1
        state = t2.fit()
        assert int(state.step) == 4  # 2 fresh steps on top of restored 2

    def test_slim_inference_state_matches_trainer(self, tmp_path):
        """load_inference_state (VERDICT r3 #7: the predict/eval CLIs' slim
        restore — no Trainer, optimizer, or training dataset) must produce
        the same predictions as the trainer-held state, and the mesh-routed
        make_predict_fn must agree with the unrouted one."""
        import jax.numpy as jnp

        from ganet_tpu.parallel.mesh import make_mesh
        from ganet_tpu.train.trainer import (
            Trainer,
            load_inference_state,
            make_predict_fn,
        )

        cfg = _tiny_cfg(tmp_path)
        t = Trainer(cfg)
        t.fit()
        t.close()

        slim = load_inference_state(cfg.save_path)
        chex = jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b)
            ),
            t.state.params,
            slim.params,
        )
        del chex
        rng = np.random.default_rng(0)
        l = jnp.asarray(rng.standard_normal((1, 48, 96, 3)).astype(np.float32))
        r = jnp.asarray(rng.standard_normal((1, 48, 96, 3)).astype(np.float32))
        predict = make_predict_fn(cfg)
        out_trainer = np.asarray(predict(t.state, l, r))
        out_slim = np.asarray(predict(slim, l, r))
        np.testing.assert_allclose(out_slim, out_trainer, rtol=1e-6, atol=1e-6)

        if jax.device_count() >= 4:
            mesh = make_mesh(MeshConfig(data=2, space=2, disp=1))
            predict_mesh = make_predict_fn(cfg, mesh)
            out_mesh = np.asarray(predict_mesh(slim, l, r))
            np.testing.assert_allclose(
                out_mesh, out_slim, rtol=1e-4, atol=1e-4
            )

    def test_loss_decreases_overfit(self, tmp_path):
        """Overfit a fixed synthetic batch: loss must drop substantially."""
        from ganet_tpu.data.dataset import SyntheticStereoDataset
        from ganet_tpu.parallel.mesh import make_mesh, shard_batch
        from ganet_tpu.train.state import create_train_state
        from ganet_tpu.train.trainer import make_train_step

        cfg = _tiny_cfg(tmp_path)
        mesh = make_mesh(cfg.mesh)
        ds = SyntheticStereoDataset(crop_height=48, crop_width=96, max_disp=24)
        s = ds[0]
        batch = {k: np.stack([v, v]) for k, v in s.items()}
        with mesh:
            state = create_train_state(cfg, jax.random.PRNGKey(0))
        step_fn = make_train_step(cfg, mesh)
        batch = shard_batch(mesh, batch)
        losses = []
        for _ in range(12):
            state, metrics = step_fn(state, batch)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.7, losses

    def test_accuracy_gate_synthetic_convergence(self, tmp_path):
        """Accuracy proxy gate (VERDICT round-1 #7, round-2 #9): the model
        must SOLVE stereo on scenes it never saw, not merely fit its train
        batches.  Train 50 steps over 32 distinct synthetic scenes, then
        gate on HELD-OUT eval EPE: < 3.5 px absolute and < 0.4x the
        fresh-init EPE (~11 px).  Calibrated envelope: held-out reaches
        2.9-3.2 px by step 40-50; a memorizing run (2 train batches)
        plateaus at 5.8 px and fails both gates."""
        from ganet_tpu.data.dataset import SyntheticStereoDataset
        from ganet_tpu.parallel.mesh import make_mesh, shard_batch
        from ganet_tpu.train.state import create_train_state
        from ganet_tpu.train.trainer import make_eval_step, make_train_step

        import dataclasses

        # lr=1e-3 matches the calibrated trajectory (3e-4 converges slower).
        cfg = dataclasses.replace(
            _tiny_cfg(tmp_path), optim=OptimConfig(lr=1e-3)
        )
        mesh = make_mesh(cfg.mesh)
        ds = SyntheticStereoDataset(crop_height=48, crop_width=96, max_disp=24)

        def make_batch(indices):
            s = [ds[i] for i in indices]
            return shard_batch(
                mesh, {k: np.stack([x[k] for x in s]) for k in s[0]}
            )

        batches = [make_batch((2 * b, 2 * b + 1)) for b in range(16)]
        held = [make_batch((40 + 2 * b, 41 + 2 * b)) for b in range(4)]
        with mesh:
            state = create_train_state(cfg, jax.random.PRNGKey(0))
        step_fn = make_train_step(cfg, mesh)
        eval_fn = make_eval_step(cfg, mesh)

        def held_epe(state):
            return float(
                np.mean([float(eval_fn(state, hb)["epe"]) for hb in held])
            )

        epe0 = held_epe(state)
        for i in range(50):
            state, m = step_fn(state, batches[i % len(batches)])
        assert np.isfinite(float(m["loss"]))
        epe = held_epe(state)
        assert np.isfinite(epe)
        assert epe < 3.5, (
            f"held-out synthetic EPE {epe} (init {epe0}): the model did not "
            "solve stereo on unseen scenes"
        )
        assert epe < 0.4 * epe0, (
            f"held-out EPE {epe} vs init {epe0}: insufficient improvement"
        )

    def test_left_right_loss_consumes_right_gt(self, tmp_path):
        """--left_right (reference train.py / dataloader flag, SURVEY.md §2
        #9/#12): the right-view GT must actually change the loss.  Round-2
        shipped the data plumbing with the loss never reading the keys —
        this pins the mirror-trick supervision in the train step."""
        import dataclasses

        from ganet_tpu.data.dataset import SyntheticStereoDataset
        from ganet_tpu.parallel.mesh import make_mesh, shard_batch
        from ganet_tpu.train.state import create_train_state
        from ganet_tpu.train.trainer import BATCH_KEYS, make_train_step

        cfg = _tiny_cfg(tmp_path)
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, left_right=True)
        )
        mesh = make_mesh(cfg.mesh)
        ds = SyntheticStereoDataset(
            crop_height=48, crop_width=96, max_disp=24, left_right=True
        )
        s = ds[0]
        batch = {k: np.stack([v, v]) for k, v in s.items()}
        assert "disparity_right" in batch and "valid_right" in batch
        keys = BATCH_KEYS + ("disparity_right", "valid_right")
        step_fn = make_train_step(cfg, mesh, keys)

        def loss_with(d_right):
            b = dict(batch)
            b["disparity_right"] = d_right
            with mesh:
                state = create_train_state(cfg, jax.random.PRNGKey(0))
            _, m = step_fn(state, shard_batch(mesh, b))
            return float(m["loss"])

        base = loss_with(batch["disparity_right"])
        shifted = loss_with(batch["disparity_right"] + 2.0)
        assert np.isfinite(base) and np.isfinite(shifted)
        assert base != pytest.approx(shifted), (
            "right-view GT change did not move the loss: --left_right is "
            "not consumed"
        )

    def test_evaluate_returns_metrics(self, tmp_path):
        from ganet_tpu.train.trainer import Trainer

        cfg = _tiny_cfg(tmp_path)
        t = Trainer(cfg)
        m = t.evaluate(max_batches=2)
        assert "epe" in m and np.isfinite(m["epe"])

    def test_restore_skips_incomplete_checkpoint(self, tmp_path):
        """Preemption safety: a process killed mid-save leaves an orbax tmp
        dir that must NOT be picked up as the latest step."""
        import os

        from ganet_tpu.train.trainer import Trainer

        cfg = _tiny_cfg(tmp_path)
        t = Trainer(cfg)
        t.fit()  # saves epoch 0 (waits at end of fit)
        # Simulate a kill mid-save of epoch 1: an un-finalized tmp dir the
        # way orbax names them before the atomic rename.
        ckpt_dir = t.ckpt_dir
        os.makedirs(
            os.path.join(ckpt_dir, "1.orbax-checkpoint-tmp-1234567890"),
        )
        t2 = Trainer(_tiny_cfg(tmp_path, epochs=2))
        assert t2.start_epoch == 1  # resumed from complete epoch 0

    def test_best_epe_checkpoint(self, tmp_path):
        import json
        import os

        from ganet_tpu.train.trainer import Trainer

        cfg = _tiny_cfg(tmp_path)
        t = Trainer(cfg)
        assert t.save_best(5.0) is True
        assert t.save_best(7.0) is False  # worse: not saved
        assert t.save_best(3.0) is True
        t.wait_for_checkpoints()
        with open(os.path.join(t.ckpt_dir, "best_epe.json")) as f:
            assert json.load(f)["epe"] == 3.0
        assert t._best_mgr.latest_step() is not None
        t.close()

    def test_evaluate_weights_by_valid_pixels(self, tmp_path):
        """Pixel-weighted aggregation: a batch with few valid pixels must
        not carry the same weight as a full one."""
        import jax.numpy as jnp

        from ganet_tpu.train import trainer as trainer_mod
        from ganet_tpu.train.trainer import Trainer

        cfg = _tiny_cfg(tmp_path)
        t = Trainer(cfg)
        fake = iter(
            [
                {"epe": jnp.array(1.0), "valid_px": jnp.array(1000.0)},
                {"epe": jnp.array(9.0), "valid_px": jnp.array(1.0)},
            ]
        )
        t.eval_step = lambda state, batch: next(fake)
        m = t.evaluate(max_batches=2)
        # weighted: (1*1000 + 9*1) / 1001 ~= 1.008, NOT the batch mean 5.0
        assert m["epe"] == pytest.approx((1000 + 9) / 1001.0)
        t.close()


class TestCLIConfig:
    def test_remat_flag_plumbs_to_model_config(self):
        import train as train_cli

        args = train_cli.parse_args(
            ["--synthetic_data", "1", "--remat", "full", "--model",
             "GANet_small", "--max_disp", "24", "--crop_height", "48",
             "--crop_width", "96"]
        )
        cfg = train_cli.build_config(args)
        assert cfg.model.remat == "full"
        # Default promoted to the measured best single-chip config
        # (batch 2, remat=sga — TRAIN_BENCH r4/r5; VERDICT r4 #2).
        args = train_cli.parse_args(["--synthetic_data", "1"])
        cfg = train_cli.build_config(args)
        assert cfg.model.remat == "sga"
        assert cfg.batch_size == 2


class TestSparseGT:
    """KITTI-style sparse supervision (reference --kitti2015 fine-tune,
    SURVEY.md §3.5): GT thinned to ~30% coverage with a LiDAR-like
    pattern must still train (VERDICT r4 #3)."""

    def test_lidar_mask_coverage(self):
        from ganet_tpu.data.dataset import SyntheticStereoDataset

        ds = SyntheticStereoDataset(
            crop_height=48, crop_width=96, max_disp=24, sparse_frac=0.3
        )
        s = ds[0]
        frac = float(s["valid"].mean())
        assert 0.15 < frac < 0.35, frac
        # no returns in the upper frame (LiDAR pattern)
        assert s["valid"][: int(48 * 0.3)].sum() == 0.0
        # dense counterpart has strictly more supervision
        dense = SyntheticStereoDataset(
            crop_height=48, crop_width=96, max_disp=24
        )[0]
        assert dense["valid"].mean() > frac

    def test_train_step_sparse_loss_finite_and_masked(self, tmp_path):
        from ganet_tpu.train.trainer import Trainer

        cfg = _tiny_cfg(tmp_path)
        cfg = dataclasses_replace_data(cfg, sparse_frac=0.3)
        t = Trainer(cfg)
        try:
            state = t.fit()
            rows = _read_log(cfg.save_path)
            train_rows = [r for r in rows if r.get("prefix", "").startswith("epoch")]
            assert train_rows, rows
            for r in train_rows:
                assert np.isfinite(r["loss"])
                assert r["valid_frac"] < 0.5  # sparse mask reached the step
                assert "lr" in r
        finally:
            t.close()


def dataclasses_replace_data(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, **kw))


def _read_log(save_path):
    import json
    import os

    path = os.path.join(save_path, "train.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
