"""Backbone (VideoMAE ViT) classification finetuning.

TPU-native equivalent of the reference's finetuning stack
(``feature_extractors/VideoMAE/{run_class_finetuning,
engine_for_finetuning,optim_factory}.py``, ~2k LoC of torch/DeepSpeed):

- layer-wise learning-rate decay (``optim_factory.py:30-58``:
  depth-indexed scale ``decay^(num_layers - layer)``, embeddings at
  layer 0, head at max);
- soft-target cross entropy (mixup targets) with label smoothing;
- batch-level mixup (video mixup; reference uses timm's Mixup);
- AdamW + warmup-cosine, no weight decay on norm/bias/pos tables.

One jit train step; pair with a classifier head over
``VideoMAEViT`` features.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from tim_tpu.train.optim import warmup_cosine_schedule
from tim_tpu.train.state import TrainState, create_train_state


def vit_layer_index(path: Tuple[str, ...], depth: int) -> int:
    """Parameter -> LLRD layer id (``optim_factory.py:30-42``): patch
    embedding and position tables at 0, block i at i+1, everything else
    (norm/head) at depth+1."""
    if path and path[0] == "trunk":   # TwoHeadViT nests the ViT trunk
        path = path[1:]
    name = path[0] if path else ""
    if name in ("patch_embed", "pos_embed", "cls_token"):
        return 0
    if name.startswith("block") and not name.startswith("decoder"):
        return int(name.replace("block", "")) + 1
    return depth + 1


def _no_decay(path: Tuple[str, ...], leaf) -> bool:
    # norm scales/biases + all biases + tokens skip weight decay
    if path and path[-1] in ("bias", "scale"):
        return True
    return leaf.ndim <= 1


def make_llrd_optimizer(
    params,
    *,
    depth: int,
    lr: float,
    weight_decay: float = 0.05,
    layer_decay: float = 0.75,
    total_steps: int = 1000,
    warmup_steps: int = 100,
    min_lr: float = 1e-6,
    clip_norm: float = 5.0,
) -> optax.GradientTransformation:
    """AdamW with per-layer lr scales and selective weight decay."""
    schedule = warmup_cosine_schedule(lr, min_lr, total_steps, warmup_steps)

    def path_names(path):
        return tuple(getattr(p, "key", getattr(p, "name", str(p)))
                     for p in path)

    scales = jax.tree_util.tree_map_with_path(
        lambda path, leaf: layer_decay ** (
            depth + 1 - vit_layer_index(path_names(path), depth)),
        params)
    decay_mask = jax.tree_util.tree_map_with_path(
        lambda path, leaf: not _no_decay(path_names(path), leaf), params)

    def scale_by_layer():
        def update(updates, state, params=None):
            return jax.tree_util.tree_map(
                lambda u, s: u * s, updates, scales), state
        return optax.GradientTransformation(lambda _: optax.EmptyState(),
                                            update)

    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.scale_by_adam(),
        optax.add_decayed_weights(weight_decay, mask=decay_mask),
        scale_by_layer(),
        optax.scale_by_learning_rate(schedule),
    )


def soft_target_cross_entropy(logits: jnp.ndarray,
                              targets: jnp.ndarray) -> jnp.ndarray:
    """Mean CE against soft target distributions (timm
    SoftTargetCrossEntropy, used with mixup)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.mean(jnp.sum(-targets * logp, axis=-1))


def mixup_targets(labels: jnp.ndarray, perm: jnp.ndarray, lam: jnp.ndarray,
                  num_classes: int, smoothing: float = 0.1) -> jnp.ndarray:
    """Smoothed one-hot targets blended by the mixup coefficient."""
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    onehot = jax.nn.one_hot(labels, num_classes) * (on - off) + off
    return lam * onehot + (1.0 - lam) * onehot[perm]


def make_finetune_step(
    apply_fn: Callable,       # (params, video, train, rngs) -> logits
    num_classes: int,
    tx: optax.GradientTransformation,
    *,
    mixup_alpha: float = 0.8,
    smoothing: float = 0.1,
):
    """Returns step(state, batch{video, label}, rng) -> (state, metrics)."""

    def step(state: TrainState, batch: Dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        rng_mix, rng_lam, rng_drop = jax.random.split(step_rng, 3)

        video = batch["video"]
        labels = batch["label"]
        b = video.shape[0]
        if mixup_alpha > 0:
            lam = jax.random.beta(rng_lam, mixup_alpha, mixup_alpha)
            perm = jax.random.permutation(rng_mix, b)
            video = (lam * video
                     + (1.0 - lam) * video[perm]).astype(video.dtype)
        else:
            lam = jnp.float32(1.0)
            perm = jnp.arange(b)
        targets = mixup_targets(labels, perm, lam, num_classes, smoothing)

        def loss_fn(params):
            logits = apply_fn(params, video, rng_drop)
            loss = soft_target_cross_entropy(logits, targets)
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == labels).astype(jnp.float32))
            return loss, {"loss": loss, "train_acc": acc}

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        return state, metrics

    return step


def make_pretrain_step(model, tx: optax.GradientTransformation):
    """MAE pretraining step: masked-tube pixel reconstruction
    (``tim_tpu/models/backbones/mae.py``; mask sampling happens on host via
    ``tim_tpu/extract/masking.py`` so index shapes stay static)."""
    from tim_tpu.models.backbones.mae import pretrain_loss

    def step(state: TrainState, video, visible_idx, masked_idx):
        def loss_fn(params):
            pred = model.apply({"params": params}, video, visible_idx,
                               masked_idx)
            return pretrain_loss(pred, video, masked_idx,
                                 model.tubelet_size, model.patch_size)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads)
        return state, {"loss": loss}

    return step
