"""Recognition train/eval steps — single fused jit graphs.

Replaces the per-batch Python of ``recognition/scripts/train.py:164-444``
(time_mlp -> mixup -> encoder -> 4x masked CE -> drloc -> AMP backward)
with one jit-compiled function: time encoding, mixup (device PRNG),
encoder, losses, gradients, and the optimizer update all fuse into a single
XLA program. Batches are dicts of fixed-shape arrays from
``tim_tpu.data.dataset``.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tim_tpu.config import ModelConfig, TrainConfig
from tim_tpu.models.tim import TimRecognition
from tim_tpu.ops import losses as L
from tim_tpu.train.state import TrainState


def _flat(x):
    return x.reshape((-1,) + x.shape[2:])


def _head_losses(
    logits: Tuple, batch: Dict, perm, lam, cfg: ModelConfig,
    tcfg: TrainConfig,
):
    """Mixup-weighted masked CE per head; mirrors
    ``recognition/scripts/train.py:219-349``."""
    verb_l, noun_l, action_l, audio_l = logits

    def mix_ce(head_logits, labels):
        return L.mixup_cross_entropy(
            _flat(head_logits), labels.reshape(-1),
            labels[perm].reshape(-1), lam,
            label_smoothing=tcfg.label_smoothing)

    out = {}
    visual_loss = jnp.float32(0.0)
    if "visual" in cfg.data_modality:
        action_loss = mix_ce(action_l, batch["action"])
        if cfg.include_verb_noun:
            verb_loss = mix_ce(verb_l, batch["verb"])
            noun_loss = mix_ce(noun_l, batch["noun"])
            visual_loss = (verb_loss + noun_loss + action_loss) / 3.0
            out.update(loss_verb=verb_loss, loss_noun=noun_loss)
        else:
            visual_loss = action_loss
        out.update(loss_action=action_loss, loss_visual=visual_loss)

    audio_loss = jnp.float32(0.0)
    if "audio" in cfg.data_modality:
        audio_loss = mix_ce(audio_l, batch["class_id"])
        out.update(loss_audio=audio_loss)

    if cfg.data_modality == "visual":
        total = visual_loss
    elif cfg.data_modality == "audio":
        total = audio_loss
    else:
        total = visual_loss + tcfg.lambda_audio * audio_loss
    return total, out


def _drloc(rng, ctx, variables, model, cfg: ModelConfig, tcfg: TrainConfig):
    if tcfg.lambda_drloc <= 0.0:
        return jnp.float32(0.0)

    def mlp_apply(pairs):
        return model.apply(variables, pairs, method=TimRecognition.drloc)

    nf = cfg.num_feats
    if cfg.input_modality == "audio_visual":
        return L.drloc_loss(
            rng, ctx[:, :nf], ctx[:, nf:2 * nf], mlp_apply, tcfg.m_drloc)
    return L.drloc_loss(rng, ctx, ctx, mlp_apply, tcfg.m_drloc)


def make_train_step(
    model: TimRecognition,
    cfg: ModelConfig,
    tcfg: TrainConfig,
    num_v_queries: int,
    num_a_queries: int,
):
    """Returns train_step(state, batch, rng) -> (state, metrics)."""

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        rng_mix, rng_drop, rng_drloc = jax.random.split(
            jax.random.fold_in(rng, state.step), 3)

        def loss_fn(params):
            variables = {"params": params}
            te = model.apply(
                variables, batch["times"],
                method=TimRecognition.encode_times)

            inputs = []
            if "visual" in cfg.input_modality:
                inputs.append(batch["v_feats"])
            if "audio" in cfg.input_modality:
                inputs.append(batch["a_feats"])
            inputs.append(te)
            mixed, perm, lam = L.mixup(rng_mix, tuple(inputs),
                                       tcfg.mixup_alpha)
            te_m = mixed[-1]
            v_m = mixed[0] if "visual" in cfg.input_modality else None
            a_m = (mixed[1] if cfg.input_modality == "audio_visual"
                   else (mixed[0] if cfg.input_modality == "audio" else None))

            logits, ctx = model.apply(
                variables, v_m, a_m, te_m, num_v_queries, num_a_queries,
                deterministic=False, rngs={"dropout": rng_drop},
                method=TimRecognition.encoder_forward)

            total, metrics = _head_losses(logits, batch, perm, lam, cfg,
                                          tcfg)
            dr = _drloc(rng_drloc, ctx, variables, model, cfg, tcfg)
            total = total + tcfg.lambda_drloc * dr
            metrics["loss_drloc"] = dr
            metrics["loss"] = total
            return total, metrics

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        metrics["grad_norm"] = optax_global_norm(grads)
        state = state.apply_gradients(grads)
        return state, metrics

    return train_step


def make_bank_train_step(
    model: TimRecognition,
    cfg: ModelConfig,
    tcfg: TrainConfig,
    num_v_queries: int,
    num_a_queries: int,
    v_bank=None,
    a_bank=None,
):
    """Train step reading features from device-resident banks
    (``tim_tpu.data.device_bank``): the batch carries ``feat_indices``
    [B, F] int32 instead of feature tensors; the gather (+ per-token
    augmentation-set sampling) runs inside the same jit graph."""
    from tim_tpu.data.device_bank import gather_window_batch

    base = make_train_step(model, cfg, tcfg, num_v_queries, num_a_queries)

    def step(state: TrainState, batch: Dict, rng: jax.Array):
        aug_rng = jax.random.fold_in(
            jax.random.fold_in(rng, state.step), 7)
        v, a = gather_window_batch(
            v_bank, a_bank, batch["feat_indices"], rng=aug_rng)
        full = {k: v2 for k, v2 in batch.items() if k != "feat_indices"}
        if v is not None:
            full["v_feats"] = v
        if a is not None:
            full["a_feats"] = a
        return base(state, full, rng)

    return step


def optax_global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_eval_step(
    model: TimRecognition,
    cfg: ModelConfig,
    tcfg: TrainConfig,
    num_v_queries: int,
    num_a_queries: int,
):
    """Returns eval_step(params, batch) -> (logits dict, losses dict).

    Logits are returned raw for window-vote ensembling on the host
    (``utils/meters.py:490-599`` accumulates raw logits per action id and
    softmaxes the seen-count-normalized sum)."""

    def eval_step(params, batch):
        variables = {"params": params}
        logits, _ = model.apply(
            variables, batch.get("v_feats"), batch.get("a_feats"),
            batch["times"], num_v_queries, num_a_queries,
            deterministic=True)
        verb_l, noun_l, action_l, audio_l = logits

        out_logits, out_losses = {}, {}

        def ce(head_logits, labels):
            return L.cross_entropy(
                _flat(head_logits), labels.reshape(-1),
                label_smoothing=tcfg.label_smoothing)

        if "visual" in cfg.data_modality:
            out_logits["action"] = action_l
            action_loss = ce(action_l, batch["action"])
            visual_loss = action_loss
            if cfg.include_verb_noun:
                out_logits["verb"] = verb_l
                out_logits["noun"] = noun_l
                verb_loss = ce(verb_l, batch["verb"])
                noun_loss = ce(noun_l, batch["noun"])
                visual_loss = (verb_loss + noun_loss + action_loss) / 3.0
                out_losses.update(loss_verb=verb_loss, loss_noun=noun_loss)
            out_losses.update(loss_action=action_loss,
                              loss_visual=visual_loss)
        if "audio" in cfg.data_modality:
            out_logits["audio"] = audio_l
            out_losses["loss_audio"] = ce(audio_l, batch["class_id"])
        return out_logits, out_losses

    return eval_step
