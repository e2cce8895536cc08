#!/usr/bin/env python
"""Wavefront-pipeline efficiency: chunked vs unchunked vertical SGA sweeps.

Times `sharded_sga` at a production-proportioned shard shape for several
W-chunk counts and prints one JSON line per config with the measured wall
time next to the schedule's static utilization model
(`pipeline_stats`).  chunks=1 serializes the vertical sweeps across shards
(each shard waits for its upstream neighbor's FULL sweep); the fused
multi-chunk wavefront overlaps them.

On this box:  GANET_FAKE_DEVICES=8 GANET_PLATFORM=cpu \
                python scripts/bench_wavefront.py --width 96 --height 32
(wall times on a 2-core host faking 8 devices measure schedule overhead
only — run on a real multi-chip slice for meaningful speedups; the static
model column is hardware-independent.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ganet_tpu.utils.platform import apply_platform_overrides


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--space", type=int, default=4)
    p.add_argument("--disp", type=int, default=64)
    p.add_argument("--height", type=int, default=64, help="global H (1/3 res)")
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--channels", type=int, default=8)
    p.add_argument("--chunks", default="1,2,3,4,8")
    p.add_argument("--impl", default="scan")
    p.add_argument(
        "--single_shard",
        action="store_true",
        help="S=1 overhead mode for one real chip (VERDICT r3 #4): plain "
        "sga vs sharded_sga S=1 vs the chunked wavefront machinery forced "
        "on — isolates the fori_loop/cond/dynamic-slice/ppermute fixed "
        "cost the static utilization model does not account for",
    )
    args = p.parse_args(argv)

    apply_platform_overrides()
    import jax
    import jax.numpy as jnp

    from ganet_tpu.config import MeshConfig
    from ganet_tpu.ops import l1_normalize
    from ganet_tpu.parallel.mesh import make_mesh
    from ganet_tpu.parallel.sharded_sga import (
        chunk_layout,
        pipeline_stats,
        sharded_sga,
    )
    from ganet_tpu.utils.profiling import benchmark_fn_chained

    space = 1 if args.single_shard else args.space
    mesh = make_mesh(MeshConfig(data=1, space=space, disp=1))
    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16 if jax.default_backend() in ("tpu", "axon") else None
    x = jax.random.normal(
        key, (1, args.disp, args.height, args.width, args.channels), dtype
    )
    w = l1_normalize(
        jax.random.uniform(
            key, (1, args.height, args.width, args.channels, 4, 5),
            jnp.float32,
        ),
        axis=-1,
    )
    if dtype is not None:
        w = w.astype(dtype)

    if args.single_shard:
        from ganet_tpu.ops import dispatch

        def emit(name, fn, extra=None):
            sec = benchmark_fn_chained(fn, x, w, iters_low=2, iters_high=4)
            print(
                json.dumps(
                    {
                        "mode": name,
                        "wall_ms": round(sec * 1e3, 2),
                        "backend": jax.default_backend(),
                        "shape": list(x.shape),
                        **(extra or {}),
                    }
                ),
                flush=True,
            )

        emit(
            "plain_sga",
            lambda a, b: dispatch.sga(a, b, impl=args.impl),
        )
        emit(
            "sharded_S1",
            lambda a, b: sharded_sga(a, b, mesh, impl=args.impl),
        )
        for chunks in [int(c) for c in args.chunks.split(",") if int(c) > 1]:
            _, starts = chunk_layout(args.width, chunks)
            emit(
                f"pipeline_S1_chunks{len(starts)}",
                lambda a, b, c=chunks: sharded_sga(
                    a, b, mesh, chunks=c, impl=args.impl, force_pipeline=True
                ),
                {"chunks": len(starts)},
            )
        return

    for chunks in [int(c) for c in args.chunks.split(",")]:
        sec = benchmark_fn_chained(
            lambda a, b: sharded_sga(
                a, b, mesh, chunks=chunks, impl=args.impl
            ),
            x,
            w,
            iters_low=2,
            iters_high=4,
        )
        _, starts = chunk_layout(args.width, chunks)
        stats = pipeline_stats(args.space, len(starts))
        print(
            json.dumps(
                {
                    "chunks": len(starts),
                    "wall_ms": round(sec * 1e3, 2),
                    "model_utilization": round(stats["utilization"], 3),
                    "critical_chunk_sweeps": stats["critical_chunk_sweeps"],
                    "backend": jax.default_backend(),
                    "shape": list(x.shape),
                    "shards": args.space,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
