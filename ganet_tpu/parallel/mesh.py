"""Device mesh construction and sharding rules.

Axes:
  data  — batch-parallel training (the reference's DataParallel, done as
          batch-axis sharding; gradients all-reduce over ICI via XLA SPMD)
  space — spatial (H) sharding of images / feature maps / cost volumes for
          memory scaling at high resolution (BASELINE.json config #5)
  disp  — disparity-axis sharding (optional; convs only — SGA sweeps keep
          disparity local because of the max_d' coupling, SURVEY.md §5)

Multi-host: call jax.distributed.initialize() before make_mesh(); the mesh
spans all global devices and per-host data feeding is handled by
data.pipeline.BatchIterator's process sharding.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ganet_tpu.config import MeshConfig

AXES = ("data", "space", "disp")


def make_mesh(cfg: Optional[MeshConfig] = None) -> Mesh:
    """Build a (data, space, disp) mesh.

    With cfg=None, all visible devices go on the data axis."""
    avail = jax.device_count()
    if cfg is None:
        shape = (avail, 1, 1)
    else:
        shape = (cfg.data, cfg.space, cfg.disp)
        if cfg.num_devices > avail:
            raise ValueError(
                f"mesh {shape} needs {cfg.num_devices} devices, have {avail}"
            )
    n = int(np.prod(shape))
    devices = mesh_utils.create_device_mesh(
        shape, devices=np.asarray(jax.devices()[:n])
    )
    return Mesh(devices, AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, ...) arrays: batch over 'data', H over 'space'."""
    return NamedSharding(mesh, P("data", "space"))


def volume_sharding(mesh: Mesh, channel_tp: bool = False) -> NamedSharding:
    """(B, D, H, W, C) cost volumes in the conv phase: batch over 'data',
    disparity over 'disp', height over 'space' (SURVEY.md §5).

    channel_tp=True repurposes the 'disp' mesh axis to shard conv CHANNELS
    instead of disparity bins (SURVEY §2 census "tensor parallel: shard
    3D-conv channels over mesh axis"): activations carry C/n channels per
    device and GSPMD partitions each 3D conv's feature dimension —
    weight-memory scaling for the hourglass where disparity sharding
    would instead pay kd=3 halo exchanges over D."""
    if channel_tp:
        return NamedSharding(mesh, P("data", None, "space", None, "disp"))
    return NamedSharding(mesh, P("data", "disp", "space"))


def fullres_volume_sharding(mesh: Mesh) -> NamedSharding:
    """(B, D, H, W) full-resolution head volumes: batch over 'data', height
    over 'space'.  D stays local — the head's softmax/regression reduce
    over it and the LGA stencil couples d-1/d/d+1."""
    return NamedSharding(mesh, P("data", None, "space"))


def constrain_volume(x, mesh: Optional[Mesh], channel_tp: bool = False):
    """with_sharding_constraint to the conv-phase (5D) or full-res head
    (4D) volume layout (no-op without a mesh or when the volume axes don't
    divide the mesh).  channel_tp shards the 5D volume's channel axis over
    'disp' instead of disparity (see volume_sharding)."""
    if mesh is None:
        return x
    if x.ndim == 4:
        if x.shape[0] % mesh.shape["data"] or x.shape[2] % mesh.shape["space"]:
            return x
        return jax.lax.with_sharding_constraint(x, fullres_volume_sharding(mesh))
    if x.shape[0] % mesh.shape["data"] or x.shape[2] % mesh.shape["space"]:
        return x
    if channel_tp:
        if x.shape[4] % mesh.shape["disp"]:
            return x
        return jax.lax.with_sharding_constraint(
            x, volume_sharding(mesh, channel_tp=True)
        )
    if x.shape[1] % mesh.shape["disp"]:
        return x
    return jax.lax.with_sharding_constraint(x, volume_sharding(mesh))


def constrain_sweep(x, mesh: Optional[Mesh]):
    """Constrain a 5D volume to the SWEEP-phase layout: batch over 'data',
    H over 'space', D and C local — used under channel_tp to re-shard the
    hourglass's C-sharded activations before the SGA kernels (whose Pallas
    calls GSPMD cannot partition at jit level)."""
    if mesh is None or x.ndim != 5:
        return x
    if x.shape[0] % mesh.shape["data"] or x.shape[2] % mesh.shape["space"]:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("data", None, "space"))
    )


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a host batch dict with batch/space sharding."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
