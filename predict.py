#!/usr/bin/env python
"""Inference CLI.

Flag-compatible with the reference's predict.py (SURVEY.md §2 #13, §3.2):
loads a checkpoint, pads each test image up to (crop_height, crop_width)
(multiples of 48), runs the model, crops back to the original frame, and
writes KITTI-submission uint16 PNGs (disparity * 256).

TPU-native additions: --synthetic_data for a no-download smoke run;
padded shapes are static so the whole forward jits once.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def output_names(entries):
    """Collision-free output PNG names for a list of dataset entries.

    KITTI lists have unique basenames (the submission layout keeps them);
    SceneFlow-style nested lists repeat basenames across scenes
    (.../left/0006.png), so those flatten the relative path into the name.
    """
    base = [os.path.basename(e) for e in entries]
    names = (
        base
        if len(set(base)) == len(base)
        else [e.strip("/").replace("/", "_") for e in entries]
    )
    return [
        n if n.lower().endswith(".png") else os.path.splitext(n)[0] + ".png"
        for n in names
    ]


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="GANet TPU inference")
    p.add_argument("--crop_height", type=int, default=384)
    p.add_argument("--crop_width", type=int, default=1248)
    p.add_argument("--max_disp", type=int, default=192)
    p.add_argument("--data_path", type=str, default="")
    p.add_argument("--test_list", type=str, default="lists/kitti2015_test.list")
    p.add_argument("--save_path", type=str, default="./result/")
    p.add_argument("--resume", type=str, default="",
                   help="checkpoint directory (orbax manager root)")
    p.add_argument("--model", type=str, default="GANet_deep",
                   choices=["GANet_deep", "GANet11", "GANet_small"])
    p.add_argument("--kitti", type=int, default=0)
    p.add_argument("--kitti2015", type=int, default=0)
    p.add_argument("--synthetic_data", type=int, default=0)
    p.add_argument("--sga_impl", type=str, default="auto",
                   choices=["auto", "scan", "pallas"])
    p.add_argument("--bf16", type=int, default=0)
    p.add_argument("--batch", type=int, default=1,
                   help="inference batch size; batching amortizes "
                        "per-kernel fixed costs (~1.4x pairs/s at 4)")
    # Multi-chip serving (VERDICT r4 #3/#4): a (data, space) inference mesh.
    # space>1 shards image height — the SGA wavefront / LGA halo paths keep
    # full-res head volumes sharded so full-frame KITTI inference fits
    # memory-constrained chips (BASELINE config #5); data>1 splits the batch.
    p.add_argument("--space", type=int, default=1,
                   help="mesh: spatial (image-height) shards")
    p.add_argument("--data", type=int, default=1,
                   help="mesh: data-parallel (batch) shards")
    return p.parse_args(argv)


def build_mesh(data: int, space: int):
    """(data, space) inference mesh, or None for the single-device path."""
    if data * space <= 1:
        return None
    import jax

    from ganet_tpu.config import MeshConfig
    from ganet_tpu.parallel.mesh import make_mesh

    if jax.device_count() < data * space:
        raise SystemExit(
            f"--data {data} --space {space} needs {data * space} devices, "
            f"have {jax.device_count()}"
        )
    return make_mesh(MeshConfig(data=data, space=space, disp=1))


def main(argv=None):
    args = parse_args(argv)
    from ganet_tpu.utils.platform import apply_platform_overrides

    apply_platform_overrides()
    import jax
    import jax.numpy as jnp

    from ganet_tpu.config import DataConfig, TrainConfig, model_config
    from ganet_tpu.data.dataset import SyntheticStereoDataset, StereoDataset
    from ganet_tpu.data.kitti_io import write_disparity_png
    from ganet_tpu.train.trainer import load_inference_state, make_predict_fn

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
    )
    cfg = TrainConfig(
        model=model,
        data=DataConfig(
            data_path=args.data_path,
            val_list=args.test_list,
            crop_height=args.crop_height,
            crop_width=args.crop_width,
            kind=kind,
        ),
        batch_size=1,
        save_path=args.resume or "./checkpoint/",
        resume=args.resume,
    )
    # Slim restore: params + batch_stats only — no optimizer, training
    # dataset, or checkpoint-manager retention (VERDICT r3 #7).
    try:
        state = load_inference_state(args.resume or "./checkpoint/")
    except FileNotFoundError:
        if args.resume:
            raise
        # No checkpoint: fresh-init weights (smoke runs on synthetic data).
        import sys

        from ganet_tpu.train.trainer import fresh_init_state

        print(
            "WARNING: no checkpoint under ./checkpoint/ — predicting with "
            "FRESH-INIT (random) weights (smoke run)",
            file=sys.stderr,
        )
        state = fresh_init_state(model, args.crop_height, args.crop_width)
    mesh = build_mesh(args.data, args.space)
    if mesh is not None and args.batch % args.data:
        raise SystemExit(
            f"--batch {args.batch} must be divisible by --data {args.data}"
        )
    predict = make_predict_fn(cfg, mesh)

    os.makedirs(args.save_path, exist_ok=True)
    if kind == "synthetic":
        ds = SyntheticStereoDataset(
            crop_height=args.crop_height,
            crop_width=args.crop_width,
            max_disp=args.max_disp,
            length=4,
            training=False,
        )
        names = [f"synthetic_{i:06d}.png" for i in range(len(ds))]
        sizes = [(args.crop_height, args.crop_width)] * len(ds)
    else:
        ds = StereoDataset(
            data_path=args.data_path,
            list_path=args.test_list,
            crop_height=args.crop_height,
            crop_width=args.crop_width,
            kind=kind,
            training=False,
            max_disp=args.max_disp,
        )
        names = output_names(ds.entries)
        sizes = [ds.original_size(i) for i in range(len(ds))]

    B = max(1, args.batch)
    n = len(ds)
    for start in range(0, n, B):
        idx = list(range(start, min(start + B, n)))
        samples = [ds[i] for i in idx]
        # Pad the final partial batch by repeating the last sample so the
        # jitted program keeps one static batch shape (no recompiles).
        while len(samples) < B:
            samples.append(samples[-1])
        left = jnp.asarray(np.stack([s["left"] for s in samples]))
        right = jnp.asarray(np.stack([s["right"] for s in samples]))
        disps = np.asarray(predict(state, left, right))
        for j, i in enumerate(idx):
            disp = disps[j]
            # Unpad: the test transform pads top/right, so the original
            # frame is the bottom-left corner.
            H, W = sizes[i]
            disp = disp[disp.shape[0] - H :, :W]
            out = os.path.join(args.save_path, names[i])
            write_disparity_png(out, disp)
            print(f"[{i + 1}/{n}] wrote {out}")


if __name__ == "__main__":
    main()
