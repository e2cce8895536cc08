"""ganet_tpu — a TPU-native stereo-depth engine with the capability set of
feihuzhang/GANet (CVPR 2019, arXiv:1904.06587), designed from scratch for
JAX/XLA/Pallas rather than ported from the reference's PyTorch+CUDA stack.

Layering (mirrors SURVEY.md §1, TPU-first):

    ops/       pure-functional cost-volume / SGA / LGA / regression ops
               (lax.scan reference semantics + Pallas TPU kernels)
    models/    Flax (linen) modules: Feature, Guidance, CostAggregation,
               GANet presets (small / 11 / deep)
    data/      PFM + KITTI-PNG IO, .list indexes, crop/normalize pipeline
    train/     loss, metrics, train state, trainer, orbax checkpointing
    parallel/  device mesh, sharding rules, sharded SGA sweeps (shard_map)
    utils/     structured logging, profiling harness

Reference parity map (reference paths per SURVEY.md §2; the reference mount
was empty during this build, so citations are to file paths + survey anchors,
not line numbers):

    libGANet/src/GANet_kernel.cu  -> ganet_tpu/ops/sga_pallas.py, lga_pallas.py
    libGANet/src/GANet_cuda.cpp   -> (not needed: jax.custom_vjp replaces FFI)
    libGANet/function/GANet.py    -> custom_vjp wrappers in ops/
    libGANet/module/GANet.py      -> ganet_tpu/ops/ + models/aggregation.py
    models/GANet_deep.py          -> ganet_tpu/models/
    models/GANet11.py             -> ganet_tpu/models/ganet.py (preset "11")
    dataloader/{data,dataset}.py  -> ganet_tpu/data/
    train.py / predict.py         -> train.py / predict.py (repo root CLIs)
"""

__version__ = "0.1.0"
