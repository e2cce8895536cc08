#!/usr/bin/env python
"""End-to-end input-pipeline throughput: disk -> BatchIterator batches.

VERDICT r3 #5: the native decoder had only a microbenchmark (2.6x Python
decode); nothing showed the full training feed path — StereoDataset
(PNG images + PFM disparity from disk, random crop, normalize) assembled
into global batches by BatchIterator with its prefetch thread — sustains
the train step's consumption rate.  Reference equivalent: the torch
DataLoader worker pool feeding train.py (SURVEY.md §3.1 hot I/O loop).

Generates a SceneFlow-layout on-disk dataset (540x960 RGB PNGs + PFM
disparity — the real SceneFlow frame size) with the repo's own writers,
then measures pairs/s through the full pipeline at the reference training
crop.  Prints one JSON line; write it to INPUT_r04.json for the round
artifact.

Run:  python scripts/bench_input.py [--samples 64] [--batch 4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def generate_dataset(root: str, n: int, H: int = 540, W: int = 960) -> str:
    """SceneFlow-style tree: frames_finalpass/scene/left|right/NNNN.png +
    disparity/scene/left/NNNN.pfm.  Returns the list-file path."""
    from PIL import Image

    from ganet_tpu.data.pfm import write_pfm

    rng = np.random.default_rng(0)
    entries = []
    for i in range(n):
        scene = f"scene{i // 8:03d}"
        name = f"{i % 8:04d}"
        ldir = os.path.join(root, "frames_finalpass", scene, "left")
        rdir = os.path.join(root, "frames_finalpass", scene, "right")
        ddir = os.path.join(root, "disparity", scene, "left")
        for d in (ldir, rdir, ddir):
            os.makedirs(d, exist_ok=True)
        # Textured random images (PNG compresses realistic content slower
        # than flat ramps — use noise so decode cost is representative).
        left = rng.integers(0, 255, (H, W, 3), np.uint8)
        right = rng.integers(0, 255, (H, W, 3), np.uint8)
        disp = (rng.random((H, W)) * 190.0).astype(np.float32)
        Image.fromarray(left).save(os.path.join(ldir, name + ".png"))
        Image.fromarray(right).save(os.path.join(rdir, name + ".png"))
        write_pfm(os.path.join(ddir, name + ".pfm"), disp)
        entries.append(f"frames_finalpass/{scene}/left/{name}.png")
    list_path = os.path.join(root, "train.list")
    with open(list_path, "w") as f:
        f.write("\n".join(entries) + "\n")
    return list_path


def measure(ds, batch: int, prefetch: int, epochs: int = 2) -> float:
    """pairs/s through BatchIterator (steady state: skips the first epoch's
    size-cache misses by timing the later epoch only)."""
    from ganet_tpu.data.pipeline import BatchIterator

    it = BatchIterator(
        ds, batch, shuffle=True, seed=0, prefetch=prefetch
    )
    pairs = 0
    t0 = None
    for e in range(epochs):
        if e == epochs - 1:
            t0 = time.perf_counter()
            pairs = 0
        for b in iter(it):
            pairs += b["left"].shape[0]
    dt = time.perf_counter() - t0
    return pairs / dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=64)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--crop_height", type=int, default=240)
    p.add_argument("--crop_width", type=int, default=528)
    p.add_argument("--keep", default="", help="dataset dir to reuse/keep")
    args = p.parse_args(argv)

    from ganet_tpu.data import native_io
    from ganet_tpu.data.dataset import StereoDataset

    root = args.keep or tempfile.mkdtemp(prefix="ganet_input_bench_")
    list_path = os.path.join(root, "train.list")
    if not os.path.exists(list_path):
        print(f"# generating {args.samples} pairs under {root}", file=sys.stderr)
        list_path = generate_dataset(root, args.samples)

    def make_ds(use_native: bool):
        return StereoDataset(
            data_path=root,
            list_path=list_path,
            crop_height=args.crop_height,
            crop_width=args.crop_width,
            kind="sceneflow",
            training=True,
            max_disp=192,
            use_native=use_native,
        )

    results = {
        "metric": "input_pipeline_pairs_per_sec",
        "unit": "pairs/s",
        "samples": args.samples,
        "crop": f"{args.crop_height}x{args.crop_width}",
        "batch": args.batch,
        "native_available": native_io.native_available(),
        "host_cpus": os.cpu_count(),
    }
    results["python_pairs_per_s"] = round(
        measure(make_ds(False), args.batch, prefetch=2), 2
    )
    if native_io.native_available():
        results["native_pairs_per_s"] = round(
            measure(make_ds(True), args.batch, prefetch=2), 2
        )
        results["native_noprefetch_pairs_per_s"] = round(
            measure(make_ds(True), args.batch, prefetch=0), 2
        )
    # Feeding margin vs the measured train step (TRAIN_BENCH_r03: 2.78
    # pairs/s/chip at this crop, batch 4, remat=full).
    best = results.get("native_pairs_per_s", results["python_pairs_per_s"])
    results["value"] = best
    results["train_step_pairs_per_s_1chip"] = 2.78
    results["feeding_margin_1chip"] = round(best / 2.78, 2)
    results["feeding_margin_8chip"] = round(best / (2.78 * 8), 2)
    print(json.dumps(results))
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
