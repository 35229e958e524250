"""Train state pytree."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # EMA of the positive-query count for detection loss normalization
    # (``detection/scripts/train.py:232,304``); unused (1.0) for recognition.
    normaliser: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(1.0))

    def apply_gradients(self, grads, **updates):
        updates_tx, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates_tx)
        return self.replace(
            step=self.step + 1, params=new_params,
            opt_state=new_opt_state, **updates)


def create_train_state(
    params, tx: optax.GradientTransformation, normaliser: float = 1.0
) -> TrainState:
    return TrainState(
        step=jnp.int32(0),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        normaliser=jnp.float32(normaliser),
    )
