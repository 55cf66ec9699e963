"""Functional train state + optimizer construction.

Replaces the LightningModule/optimizer-object machinery
(``/root/reference/models/ModelMeta.py:85-112``) with an immutable pytree:
params, optional BatchNorm stats, optimizer state, and step counter. The
optimizer is optax Adam behind the same knobs as the reference's
``SAMSGD(lr=1e-4)`` + ``MultiStepLR(milestones=[40], gamma=0.1)``
(``ModelMeta.py:104-112``); SAM's two-point gradient lives in
``fdtpu/train/sam.py``.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from fdtpu.utils.config import TrainConfig


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any  # {} for BN-free models
    opt_state: Any

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def make_lr_schedule(config: TrainConfig, steps_per_epoch: int):
    """MultiStepLR as an optax schedule: xgamma at each milestone epoch
    (``ModelMeta.py:109-111``: milestones=[40], gamma=0.1)."""
    boundaries = {
        int(m) * steps_per_epoch: config.lr_gamma for m in config.lr_milestones
    }
    return optax.piecewise_constant_schedule(config.learning_rate, boundaries)


def make_optimizer(config: TrainConfig, steps_per_epoch: int):
    """Adam with the reference's defaults (torch Adam: b1=0.9, b2=0.999,
    eps=1e-8) under the MultiStep schedule; ``config.optimizer="sgd"`` swaps
    in plain SGD (useful where Adam's sign(grad) first step amplifies fp
    reduction-order noise, e.g. cross-layout numerics tests)."""
    schedule = make_lr_schedule(config, steps_per_epoch)
    if config.optimizer == "sgd":
        return optax.sgd(schedule)
    assert config.optimizer == "adam", config.optimizer
    return optax.adam(schedule)


def create_train_state(
    module,
    config: TrainConfig,
    rng: jax.Array,
    steps_per_epoch: int = 1000,
) -> tuple[TrainState, optax.GradientTransformation]:
    h, w = module.input_shape
    variables = module.init(rng, jnp.zeros((1, h, w, 3), jnp.float32), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(config, steps_per_epoch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
    return state, tx
