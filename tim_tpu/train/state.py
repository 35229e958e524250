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


def training_rng(seed: int, impl: str = "rbg") -> jax.Array:
    """The training-step PRNG key (``TrainConfig.rng_impl``).

    ``impl="rbg"`` routes dropout/mixup mask bits through XLA's
    RngBitGenerator (the TPU hardware RNG) instead of threefry2x32 on the
    VPU — measured 208 -> 245 win/s on detection train b64, where
    threefry mask generation was ~1/3 of the whole step
    (``scripts/bench_bwd_micro.py``). ``split``/``fold_in`` on rbg keys
    stay threefry-derived, so key-derivation structure is unchanged;
    only the raw bit generation differs.
    """
    return jax.random.key(seed, impl=impl)
