"""Implementation dispatch for the hot ops.

Selects between the pure-JAX scan/stencil ops (semantics oracle, any
backend) and the Pallas TPU kernels (performance path).  This replaces the
reference's build-time switch — there, using the fast path required
compiling the CUDA extension (libGANet/setup.py, SURVEY.md §3.4); here both
paths are always importable and numerically interchangeable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ganet_tpu.ops.lga import lga as _lga_scan
from ganet_tpu.ops.lga import lga3d as _lga3d_scan
from ganet_tpu.ops.sga import sga as _sga_scan


@functools.cache
def _default_backend_is_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def resolve_impl(impl: str) -> str:
    if impl == "auto":
        return "pallas" if _default_backend_is_tpu() else "scan"
    if impl not in ("scan", "pallas"):
        raise ValueError(f"unknown sga impl {impl!r}")
    return impl


def sga(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    impl: str = "auto",
    mesh=None,
    space_axis: str = "space",
    batch_axis: str = "data",
    chunks: int = 0,
) -> jnp.ndarray:
    """SGA with implementation + distribution dispatch.

    When `mesh` is given and its `space_axis` has more than one shard, the
    op routes through the wavefront-pipelined cross-shard sweep
    (parallel/sharded_sga.py — the cost-volume sequence-parallel path,
    BASELINE.json config #5) instead of leaving GSPMD to all-gather around
    the scan.
    """
    impl = resolve_impl(impl)
    if mesh is not None and mesh.shape.get(space_axis, 1) > 1:
        from ganet_tpu.parallel.sharded_sga import sharded_sga

        data_shards = mesh.shape.get(batch_axis, 1)
        return sharded_sga(
            x,
            weights,
            mesh,
            axis_name=space_axis,
            chunks=chunks,
            # Shard batch only when it divides (batch-1 eval on a data>1
            # training mesh keeps the batch replicated instead of erroring).
            batch_axis=batch_axis
            if data_shards > 1 and x.shape[0] % data_shards == 0
            else None,
            impl=impl,
        )
    if impl == "pallas":
        from ganet_tpu.ops import sga_pallas  # deferred: optional path

        return sga_pallas.sga(x, weights)
    return _sga_scan(x, weights)


def lga(
    x: jnp.ndarray,
    g: jnp.ndarray,
    radius: int = 2,
    repeats: int = 1,
    impl: str = "auto",
    mesh=None,
    space_axis: str = "space",
    batch_axis: str = "data",
) -> jnp.ndarray:
    """LGA with implementation + distribution dispatch.

    When `mesh` is given and its `space_axis` has more than one shard, the
    full-resolution stencil runs H-sharded under shard_map with a radius-r
    halo ppermute (parallel/sharded_lga.py) — the DispAgg head's (B, D, H,
    W) volume, the model's largest tensor, is never gathered.
    """
    impl = resolve_impl(impl)
    if (
        mesh is not None
        and mesh.shape.get(space_axis, 1) > 1
        and x.shape[2] % mesh.shape[space_axis] == 0
        and x.shape[2] // mesh.shape[space_axis] >= radius
    ):
        from ganet_tpu.parallel.sharded_lga import sharded_lga

        data_shards = mesh.shape.get(batch_axis, 1)
        return sharded_lga(
            x,
            g,
            mesh,
            radius=radius,
            repeats=repeats,
            axis_name=space_axis,
            batch_axis=batch_axis
            if data_shards > 1 and x.shape[0] % data_shards == 0
            else None,
            impl=impl,
        )
    if impl == "pallas":
        from ganet_tpu.ops import lga_pallas

        return lga_pallas.lga(x, g, radius=radius, repeats=repeats)
    return _lga_scan(x, g, radius=radius, repeats=repeats)


def lga3d(
    x: jnp.ndarray,
    g: jnp.ndarray,
    radius: int = 2,
    repeats: int = 1,
    impl: str = "auto",
) -> jnp.ndarray:
    """Channel-wise LGA on a (B, D, H, W, C) volume (reference
    `Lga3dFunction`); the Pallas path folds channels into the kernel's
    batch grid dimension."""
    impl = resolve_impl(impl)
    if impl == "pallas":
        from ganet_tpu.ops import lga_pallas

        B, D, H, W, C = x.shape
        xf = jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(B * C, D, H, W)
        gf = jnp.repeat(g, C, axis=0)
        out = lga_pallas.lga(xf, gf, radius=radius, repeats=repeats)
        return jnp.transpose(out.reshape(B, C, D, H, W), (0, 2, 3, 4, 1))
    return _lga3d_scan(x, g, radius=radius, repeats=repeats)
