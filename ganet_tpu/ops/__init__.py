"""Functional ops: the TPU-native replacement for the reference's
`libGANet` extension stack (SURVEY.md §2 #1-#6).

Two implementations of the hot ops are provided and kept in lock-step by
tests:

* pure-JAX (`sga.py`, `lga.py`): `lax.scan` / stencil formulations that are
  the semantics oracle, differentiable end-to-end, and run on any backend;
* Pallas (`sga_pallas.py`, `lga_pallas.py`): hand-scheduled TPU kernels with
  custom VJPs for the performance path.
"""

from ganet_tpu.ops.cost_volume import build_cost_volume
from ganet_tpu.ops.disparity import (
    disparity_regression,
    soft_argmin,
    trilinear_upsample,
)
from ganet_tpu.ops.normalize import l1_normalize
from ganet_tpu.ops.sga import sga, sga_sweep
from ganet_tpu.ops.lga import lga, lga3d

__all__ = [
    "build_cost_volume",
    "disparity_regression",
    "soft_argmin",
    "trilinear_upsample",
    "l1_normalize",
    "sga",
    "sga_sweep",
    "lga",
    "lga3d",
]
