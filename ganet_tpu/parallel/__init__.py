"""Distribution layer — the subsystem the reference lacks entirely (its
only parallelism is single-process nn.DataParallel; SURVEY.md §2
parallelism census).  Built on jax.sharding meshes + XLA SPMD:

  mesh.py      logical mesh (data, space, disp) + sharding rules
  sharded_sga  shard_map SGA sweeps across a sharded spatial axis with a
               ppermute carry pipeline (the cost-volume analogue of
               sequence parallelism — SURVEY.md §5 "Long-context")
"""

from ganet_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding"]
