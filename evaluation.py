#!/usr/bin/env python
"""Evaluation CLI.

Reference: the val()/eval logic in the reference's train.py and the
standalone evaluation flow (SURVEY.md §2 #14): computes EPE, >1/2/3-px
error rates, and KITTI D1-all, either

  * from saved disparity PNGs against ground truth
      python evaluation.py --pred_path ./result/ --gt_path ... \
          --test_list lists/kitti2015_val.list --kitti2015 1
  * or end-to-end from a checkpoint over a list (runs the model):
      python evaluation.py --resume ./checkpoint --data_path ... \
          --test_list ... --crop_height 384 --crop_width 1248
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="GANet TPU evaluation")
    p.add_argument("--pred_path", type=str, default="",
                   help="directory of predicted disparity PNGs; empty = run model")
    p.add_argument("--gt_path", type=str, default="")
    p.add_argument("--data_path", type=str, default="")
    p.add_argument("--test_list", type=str, required=True)
    p.add_argument("--kitti", type=int, default=0)
    p.add_argument("--kitti2015", type=int, default=0)
    p.add_argument("--synthetic_data", type=int, default=0)
    p.add_argument("--max_disp", type=int, default=192)
    p.add_argument("--crop_height", type=int, default=384)
    p.add_argument("--crop_width", type=int, default=1248)
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--model", type=str, default="GANet_deep")
    p.add_argument("--max_samples", type=int, default=0)
    p.add_argument("--weighting", choices=["image", "pixel"], default="image",
                   help="'image' = mean of per-image metrics (the KITTI "
                        "protocol and the reference's val loop); 'pixel' = "
                        "valid-pixel-weighted (matches Trainer.evaluate)")
    # Multi-chip online evaluation (VERDICT r4 #4): same mesh flags as
    # predict.py — space>1 H-shards the model, data>1 batches the loop.
    p.add_argument("--space", type=int, default=1,
                   help="mesh: spatial (image-height) shards")
    p.add_argument("--data", type=int, default=1,
                   help="mesh: data-parallel (batch) shards")
    return p.parse_args(argv)


def _metrics_np(pred, gt, max_disp):
    valid = (gt > 0) & (gt < max_disp)
    n = max(valid.sum(), 1)
    err = np.abs(pred - gt)
    d1 = (err > 3.0) & (err > 0.05 * np.abs(gt))
    return {
        "epe": float((err * valid).sum() / n),
        "rate_1px": float(((err > 1.0) & valid).sum() / n),
        "rate_2px": float(((err > 2.0) & valid).sum() / n),
        "rate_3px": float(((err > 3.0) & valid).sum() / n),
        "d1_all": float((d1 & valid).sum() / n),
        "valid_px": float(valid.sum()),
    }


def main(argv=None):
    args = parse_args(argv)
    kind = (
        "synthetic" if args.synthetic_data
        else "kitti2015" if args.kitti2015
        else "kitti2012" if args.kitti
        else "sceneflow"
    )

    totals: dict = {}
    count = 0
    weight_sum = 0.0

    def accumulate(m):
        nonlocal count, weight_sum
        w = m.pop("valid_px") if args.weighting == "pixel" else 1.0
        for k, v in m.items():
            if k != "valid_px":
                totals[k] = totals.get(k, 0.0) + v * w
        weight_sum += w
        count += 1

    if args.pred_path:
        # Offline: compare saved PNGs against ground truth.
        from ganet_tpu.data.kitti_io import read_disparity_png
        from ganet_tpu.data.lists import derive_paths, read_list
        from ganet_tpu.data.pfm import read_pfm

        from predict import output_names

        entries = read_list(args.test_list)
        if args.max_samples:
            entries = entries[: args.max_samples]
        # Same collision-free naming as predict.py writes.
        names = output_names(entries)
        for e, name in zip(entries, names):
            paths = derive_paths(args.gt_path or args.data_path, e, kind)
            pred = read_disparity_png(os.path.join(args.pred_path, name))
            if kind == "sceneflow":
                gt = read_pfm(paths.disparity)
                gt = np.abs(gt[..., 0] if gt.ndim == 3 else gt)
            else:
                gt = read_disparity_png(paths.disparity)
            accumulate(_metrics_np(pred, gt, args.max_disp))
    else:
        # Online: run the model over the list.
        from ganet_tpu.utils.platform import apply_platform_overrides

        apply_platform_overrides()
        import jax.numpy as jnp

        from ganet_tpu.config import DataConfig, TrainConfig, model_config
        from ganet_tpu.data.dataset import get_test_set
        from ganet_tpu.train.trainer import (
            load_inference_state,
            make_predict_fn,
        )

        cfg = TrainConfig(
            model=model_config(args.model, max_disp=args.max_disp),
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
        # Slim restore (params + batch_stats) — no Trainer/optimizer/
        # training-dataset construction just to run forward (VERDICT r3 #7).
        # With an explicit --resume a missing checkpoint is an error; with
        # none, fall back to fresh-init weights like predict.py does
        # (smoke runs on synthetic data; ADVICE r4 #1).
        try:
            state = load_inference_state(args.resume or "./checkpoint/")
        except FileNotFoundError:
            if args.resume:
                raise FileNotFoundError(
                    f"--resume {args.resume}: no checkpoint found; "
                    "evaluation needs a trained checkpoint (or drop "
                    "--resume to evaluate fresh-init weights)"
                )
            import sys

            from ganet_tpu.train.trainer import fresh_init_state

            # Loud: metrics from random weights must never pass silently
            # as a real evaluation.
            print(
                "WARNING: no checkpoint under ./checkpoint/ — evaluating "
                "FRESH-INIT (random) weights; metrics are meaningless "
                "except as a smoke test",
                file=sys.stderr,
            )
            state = fresh_init_state(
                cfg.model, args.crop_height, args.crop_width
            )
        from predict import build_mesh

        mesh = build_mesh(args.data, args.space)
        predict = make_predict_fn(cfg, mesh)
        ds = get_test_set(cfg.data, args.max_disp)
        n = len(ds) if not args.max_samples else min(len(ds), args.max_samples)
        B = max(1, args.data)
        for start in range(0, n, B):
            idx = list(range(start, min(start + B, n)))
            samples = [ds[i] for i in idx]
            # Pad the final partial batch (static jit shape); padded rows
            # are not accumulated.
            while len(samples) < B:
                samples.append(samples[-1])
            preds = np.asarray(
                predict(
                    state,
                    jnp.asarray(np.stack([s["left"] for s in samples])),
                    jnp.asarray(np.stack([s["right"] for s in samples])),
                )
            )
            for j, i in enumerate(idx):
                accumulate(
                    _metrics_np(
                        preds[j], samples[j]["disparity"], args.max_disp
                    )
                )

    denom = weight_sum if args.weighting == "pixel" else count
    result = {k: v / max(denom, 1) for k, v in totals.items()}
    print(
        f"samples={count} "
        + " ".join(f"{k}={v:.4f}" for k, v in sorted(result.items()))
    )
    return result


if __name__ == "__main__":
    main()
