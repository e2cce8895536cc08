#!/usr/bin/env python
"""Training CLI.

Flag-compatible with the reference's train.py (SURVEY.md §2 #12) — the
reference command lines

  python train.py --crop_height=240 --crop_width=528 --max_disp=192 \
      --batchSize=16 --nEpochs=10 --data_path=... --training_list=... \
      --save_path=./checkpoint --model GANet_deep
  python train.py --kitti2015=1 --resume ./checkpoint ...

work unchanged.  TPU-native additions: --mesh_data/--mesh_space/--mesh_disp
select the device mesh, --synthetic_data trains on the procedural dataset
(no downloads needed), --steps caps steps/epoch, --eval runs validation
after every epoch.
"""

from __future__ import annotations

import argparse

from ganet_tpu.config import (
    DataConfig,
    MeshConfig,
    OptimConfig,
    TrainConfig,
    model_config,
)


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="GANet TPU training")
    # Reference flags (names preserved).
    p.add_argument("--crop_height", type=int, default=240)
    p.add_argument("--crop_width", type=int, default=528)
    p.add_argument("--max_disp", type=int, default=192)
    # Default batch/remat are the measured single-chip sweet spot (batch 2,
    # remat=sga: 3.22 pairs/s vs 3.00 at batch 4 remat=full — TRAIN_BENCH
    # r4/r5; the reference default batchSize 8 does not fit one 16 GiB
    # chip at the 240x528 crop).  Multi-chip runs should scale batchSize
    # with --mesh_data.
    p.add_argument("--batchSize", type=int, default=2)
    p.add_argument("--nEpochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--kitti", type=int, default=0)
    p.add_argument("--kitti2015", type=int, default=0)
    p.add_argument("--data_path", type=str, default="")
    p.add_argument("--training_list", type=str, default="lists/sceneflow_train.list")
    p.add_argument("--val_list", type=str, default="lists/sceneflow_test_select.list")
    p.add_argument("--save_path", type=str, default="./checkpoint/")
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--model", type=str, default="GANet_deep",
                   choices=["GANet_deep", "GANet11", "GANet_small"])
    p.add_argument("--left_right", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    # TPU-native additions.
    p.add_argument("--synthetic_data", type=int, default=0,
                   help="train on the procedural dataset (tests/smoke)")
    p.add_argument("--sparse_frac", type=float, default=0.0,
                   help="synthetic data: thin GT to ≈ this valid fraction "
                        "with a KITTI-LiDAR-like pattern (sparse-"
                        "supervision fine-tune regime; 0 = dense)")
    p.add_argument("--steps", type=int, default=0, help="steps per epoch cap")
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_space", type=int, default=1)
    p.add_argument("--mesh_disp", type=int, default=1)
    p.add_argument("--channel_tp", type=int, default=0,
                   help="shard 3D-conv CHANNELS (not disparity bins) over "
                        "the mesh_disp axis — weight/activation memory "
                        "scaling for the aggregation hourglass")
    p.add_argument("--eval", type=int, default=0, help="validate after training")
    p.add_argument("--lr_decay_epoch", type=int, default=0)
    p.add_argument("--bf16", type=int, default=0, help="bfloat16 conv compute")
    p.add_argument("--sga_impl", type=str, default="auto",
                   choices=["auto", "scan", "pallas"])
    p.add_argument("--remat", type=str, default="sga",
                   choices=["none", "sga", "full"],
                   help="rematerialization policy: trade backward "
                        "recompute for activation memory (default sga — "
                        "the measured best throughput at the default "
                        "batch 2; remat=full fits batch 4-6 of the "
                        "240x528 crop on one 16 GiB chip)")
    p.add_argument("--distributed", type=int, default=0,
                   help="multi-host: jax.distributed.initialize() before "
                        "building the mesh (coordinator from the standard "
                        "JAX env vars / TPU metadata)")
    p.add_argument("--prefetch", type=int, default=2,
                   help="batches staged by the background input thread; 0 "
                        "disables the thread (required on hosts whose "
                        "remote-TPU client is not thread-safe — the axon "
                        "relay here wedges after ~30 steps with it on)")
    p.add_argument("--compile_cache", type=int, default=1,
                   help="persistent XLA compilation cache")
    return p.parse_args(argv)


def build_config(args: argparse.Namespace) -> TrainConfig:
    kind = (
        "synthetic"
        if args.synthetic_data
        else "kitti2015"
        if args.kitti2015
        else "kitti2012"
        if args.kitti
        else "sceneflow"
    )
    model = model_config(
        args.model,
        max_disp=args.max_disp,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        sga_impl=args.sga_impl,
        remat=args.remat,
        channel_tp=bool(args.channel_tp),
    )
    return TrainConfig(
        model=model,
        data=DataConfig(
            data_path=args.data_path,
            training_list=args.training_list,
            val_list=args.val_list,
            crop_height=args.crop_height,
            crop_width=args.crop_width,
            kind=kind,
            left_right=bool(args.left_right),
            num_prefetch=args.prefetch,
            sparse_frac=args.sparse_frac,
        ),
        optim=OptimConfig(
            lr=args.lr,
            decay_epoch=args.lr_decay_epoch or None,
        ),
        mesh=MeshConfig(
            data=args.mesh_data, space=args.mesh_space, disp=args.mesh_disp
        ),
        batch_size=args.batchSize,
        num_epochs=args.nEpochs,
        steps_per_epoch=args.steps or None,
        save_path=args.save_path,
        resume=args.resume,
        seed=args.seed,
    )


def main(argv=None):
    args = parse_args(argv)
    cfg = build_config(args)
    from ganet_tpu.utils.platform import (
        apply_platform_overrides,
        enable_compile_cache,
    )

    apply_platform_overrides()
    if args.compile_cache:
        enable_compile_cache()
    if args.distributed:
        # Multi-host bring-up (SURVEY.md §5 "Distributed communication
        # backend"): the coordinator address/process count come from the
        # standard JAX env vars or the TPU pod metadata; the mesh built by
        # the Trainer then spans all global devices.
        import jax

        jax.distributed.initialize()
    from ganet_tpu.train.trainer import Trainer  # defer jax import cost

    trainer = Trainer(cfg)
    print(
        f"model={cfg.model.name} max_disp={cfg.model.max_disp} "
        f"crop={cfg.data.crop_height}x{cfg.data.crop_width} "
        f"batch={cfg.batch_size} mesh={dict(trainer.mesh.shape)}"
    )
    try:
        trainer.fit()
        if args.eval:
            trainer.evaluate()
    finally:
        trainer.close()


if __name__ == "__main__":
    main()
