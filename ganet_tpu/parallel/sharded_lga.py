"""Spatially-sharded LGA: radius-r halo exchange + local stencil.

The DispAgg head runs LGA on the FULL-resolution (B, D, H, W) volume — the
largest tensor in the model (reference `lga_cuda_forward` inside `DispAgg`,
models/GANet_deep.py; SURVEY.md §2 #2).  With H sharded over the mesh's
'space' axis, the 5x5 stencil needs only `radius` rows from each spatial
neighbor, so the distribution is the stencil analogue of the SGA wavefront
(parallel/sharded_sga.py): two ppermutes exchange the halo rows, the local
kernel (scan oracle or Pallas) filters the haloed block, and the halo-row
outputs are discarded.  ppermute's zero-fill for edge shards reproduces the
unsharded op's zero spatial padding exactly, so sharded == unsharded to
numerical precision — no all-gather of the full-res volume is ever
materialized (asserted on compiled HLO in tests/test_sharding.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ganet_tpu.ops.lga import lga as _lga_scan


def _local_lga(x, g, radius: int, impl: str):
    if impl == "pallas":
        from ganet_tpu.ops import lga_pallas

        return lga_pallas.lga(x, g, radius=radius, repeats=1)
    return _lga_scan(x, g, radius=radius, repeats=1)


def _halo_rows(x, radius: int, axis_name: str):
    """(top, bottom) halo rows from the spatial neighbors of each shard.

    x: (B, D, Hl, W).  Shards not receiving (the edge shards' outer halos)
    get ppermute's zero fill — exactly the unsharded op's zero padding.
    """
    S = lax.axis_size(axis_name)
    down = [(i, i + 1) for i in range(S - 1)]  # my bottom rows -> s+1's top
    up = [(i, i - 1) for i in range(1, S)]  # my top rows -> s-1's bottom
    top = lax.ppermute(x[:, :, -radius:], axis_name, down)
    bottom = lax.ppermute(x[:, :, :radius], axis_name, up)
    return top, bottom


def _sharded_lga_local(
    x, g, radius: int, repeats: int, axis_name: str, impl: str
):
    r = radius
    for _ in range(repeats):
        top, bottom = _halo_rows(x, r, axis_name)
        xh = jnp.concatenate([top, x, bottom], axis=2)
        # Halo rows' outputs are sliced off, so their guidance is dead —
        # zero-pad keeps shapes consistent at (2r/Hl) extra stencil work.
        gh = jnp.pad(g, ((0, 0), (r, r), (0, 0), (0, 0)))
        x = _local_lga(xh, gh, r, impl)[:, :, r:-r]
    return x


def sharded_lga(
    x: jnp.ndarray,
    g: jnp.ndarray,
    mesh: Mesh,
    radius: int = 2,
    repeats: int = 1,
    axis_name: str = "space",
    batch_axis: Optional[str] = None,
    impl: str = "scan",
) -> jnp.ndarray:
    """LGA over a (B, D, H, W) volume H-sharded on `axis_name`.

    Same contract as ops.lga.lga (g: (B, H, W, 3*K*K), caller-normalized).
    H must be divisible by the shard count and each local block must be at
    least `radius` rows tall.  Each repeat re-exchanges halos (the second
    pass filters the first pass's output, whose boundary rows live on the
    neighbor).
    """
    S = mesh.shape[axis_name]
    if x.shape[2] % S or x.shape[2] // S < radius:
        raise ValueError(
            f"H={x.shape[2]} must divide into >={radius}-row blocks over"
            f" {S} '{axis_name}' shards"
        )
    spec_x = P(batch_axis, None, axis_name, None)
    spec_g = P(batch_axis, axis_name, None, None)
    fn = jax.shard_map(
        functools.partial(
            _sharded_lga_local,
            radius=radius,
            repeats=repeats,
            axis_name=axis_name,
            impl=impl,
        ),
        mesh=mesh,
        in_specs=(spec_x, spec_g),
        out_specs=spec_x,
        check_vma=False,  # pallas_call custom calls, as in sharded_sga
    )
    return fn(x, g)
