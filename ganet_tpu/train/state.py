"""Train state: parameters + BatchNorm statistics + optimizer state.

Replaces the reference's ad-hoc `torch.save({'epoch', 'state_dict', ...})`
checkpoint payload (SURVEY.md §5 "Checkpoint / resume") with a single
pytree that orbax can save/restore sharding-aware.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ganet_tpu.config import OptimConfig, TrainConfig
from ganet_tpu.models import GANet


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def make_optimizer(
    optim: OptimConfig, steps_per_epoch: Optional[int] = None
) -> optax.GradientTransformation:
    """Adam with optional step decay at a given epoch (reference train.py:
    Adam(lr, betas=(0.9, 0.999)); KITTI fine-tune drops lr 10x)."""
    if optim.decay_epoch is not None and steps_per_epoch:
        schedule = optax.piecewise_constant_schedule(
            optim.lr,
            {optim.decay_epoch * steps_per_epoch: optim.decay_factor},
        )
    else:
        schedule = optim.lr
    return optax.adam(schedule, b1=optim.beta1, b2=optim.beta2)


def create_train_state(
    cfg: TrainConfig,
    rng: jax.Array,
    steps_per_epoch: Optional[int] = None,
    mesh=None,
) -> TrainState:
    """Initialize model variables and optimizer state on small dummy input
    of the configured crop size.

    `mesh` routes the model's SGA through the cross-shard wavefront
    pipeline when its 'space' axis is >1 (see models/ganet.py)."""
    model = GANet(cfg.model, mesh=mesh)
    B = max(1, cfg.batch_size // jax.process_count())
    dummy = jnp.zeros(
        (B, cfg.data.crop_height, cfg.data.crop_width, 3), jnp.float32
    )
    variables = jax.jit(
        lambda r: model.init(r, dummy, dummy, train=True),
    )(rng)
    tx = make_optimizer(cfg.optim, steps_per_epoch)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
