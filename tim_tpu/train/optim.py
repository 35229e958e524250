"""Optimizer + LR schedule.

Replicates the reference recipe (``recognition/scripts/train.py:66-82``):
AdamW, cosine annealing to ``min_lr`` over all steps, multiplied by a
linear warmup factor (pytorch-warmup's ``LinearWarmup`` dampening), global
gradient-norm clip 1.0. On TPU there is no GradScaler — bf16 matmuls with
fp32 params/optimizer state need no loss scaling.

Non-finite updates are skipped (``optax.apply_if_finite``) instead of
crashing like the reference's ``check_nan_losses`` (``utils/misc.py:27-34``);
the skip count is observable in the optimizer state.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def warmup_cosine_schedule(
    lr: float, min_lr: float, total_steps: int, warmup_steps: int
):
    """cosine(step) * min(1, (step+1)/warmup) — torch CosineAnnealingLR
    with pytorch-warmup LinearWarmup dampening."""

    def schedule(step):
        t = jnp.minimum(step, total_steps).astype(jnp.float32)
        cosine = min_lr + 0.5 * (lr - min_lr) * (
            1.0 + jnp.cos(jnp.pi * t / max(total_steps, 1)))
        if warmup_steps > 0:
            warm = jnp.minimum(1.0, (t + 1.0) / warmup_steps)
        else:
            warm = 1.0
        return cosine * warm

    return schedule


def make_optimizer(
    lr: float,
    weight_decay: float,
    total_steps: int,
    warmup_steps: int,
    *,
    min_lr: float = 1e-6,
    clip_norm: float = 1.0,
) -> optax.GradientTransformation:
    schedule = warmup_cosine_schedule(lr, min_lr, total_steps, warmup_steps)
    inner = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        # torch.optim.AdamW defaults: betas (0.9, 0.999), eps 1e-8, decay on
        # every param (incl. norms/biases) — kept for recipe parity.
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=weight_decay),
    )
    return optax.apply_if_finite(inner, max_consecutive_errors=8)
