"""Detection train/inference steps — single fused jit graphs.

Replaces ``detection/scripts/train.py:164-462`` + the query machinery the
reference runs inside ``forward_train``/``forward_inference``
(``detection/.../models/tim.py:272-400``): pyramid sampling, IoU labeling,
focal + DIoU losses with the EMA positive-count normaliser, all under one
jit. The normaliser is carried in ``TrainState.normaliser`` (the reference
keeps it as a Python float and checkpoints it, ``train.py:89,152``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from tim_tpu.config import DetectionConfig, TrainConfig
from tim_tpu.models import queries as Q
from tim_tpu.models.tim import TimDetection
from tim_tpu.ops import losses as L
from tim_tpu.train.recognition import optax_global_norm
from tim_tpu.train.state import TrainState


def _flat(x):
    return x.reshape((-1,) + x.shape[2:])


def _modality_losses(
    cls_logits, reg_preds, targets, labels, ious,
    cfg: DetectionConfig, tcfg: TrainConfig, normaliser, modality: str,
    *, update_normaliser: bool = True,
):
    """Focal cls (IoU-weighted) + DIoU reg for one modality, following
    ``detection/scripts/train.py:222-341``. Returns (cls_loss, reg_loss,
    new_normaliser, num_pos). ``update_normaliser=False`` divides by the
    incoming value unchanged — the reference's validation semantics
    (``test.py:77-85`` takes a FIXED normaliser and never advances it)."""
    flat_targets = _flat(targets)
    flat_ious = ious.reshape(-1)
    positives = jnp.isfinite(flat_targets[:, 0])
    num_pos = jnp.sum(positives)

    if update_normaliser:
        # EMA normaliser of the positive count (``train.py:232``).
        normaliser = (tcfg.normaliser_momentum * normaliser
                      + (1.0 - tcfg.normaliser_momentum)
                      * jnp.maximum(num_pos.astype(jnp.float32), 1.0))

    # Queries below the IoU threshold get weight 1.0, positives their IoU
    # (``train.py:230``; post-fix semantics, see detection/README.md:3-8).
    w = jnp.where(flat_ious < cfg.iou_threshold, 1.0, flat_ious)

    def focal_sum(logits, int_labels):
        # fused smoothed-target focal: no [N, C] target materialization
        return L.sigmoid_focal_loss_smoothed(
            _flat(logits), int_labels, cfg.label_smoothing,
            alpha=tcfg.focal_alpha, gamma=tcfg.focal_gamma, weights=w)

    flat_labels = _flat(labels)
    if modality == "visual":
        if len(cfg.visual_classes) == 3:
            cls_loss = (focal_sum(cls_logits[0], flat_labels[:, 0])
                        + focal_sum(cls_logits[1], flat_labels[:, 1])
                        + focal_sum(cls_logits[2], flat_labels[:, 2])) / 3.0
        else:
            cls_loss = focal_sum(cls_logits[2], flat_labels[:, -1])
    else:
        cls_loss = focal_sum(cls_logits[3], flat_labels[:, -1])
    cls_loss = cls_loss / normaliser

    # DIoU on positives only; inf targets zeroed out via the mask.
    safe_targets = jnp.where(positives[:, None], flat_targets, 0.0)
    reg_per = L.ctr_diou_loss_1d(_flat(reg_preds), safe_targets,
                                 reduction="none")
    reg_loss = (jnp.sum(reg_per * positives) * tcfg.lambda_reg) / normaliser

    return cls_loss, reg_loss, normaliser, num_pos


def make_train_step(
    model: TimDetection,
    cfg: DetectionConfig,
    tcfg: TrainConfig,
    num_queries: int | None = None,
):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    The train pool is the fine pyramid (query_size 0.005); each step samples
    ``num_queries`` of them (default: the inference-grid size), shared
    across the batch (``detection/.../tim.py:281-284``)."""
    train_pool = jnp.asarray(Q.generate_query_pyramid(cfg.train_query_size))
    if num_queries is None:
        num_queries = Q.generate_query_pyramid(
            cfg.inference_query_size).shape[0]

    has_visual = "visual" in cfg.data_modality
    has_audio = "audio" in cfg.data_modality

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        rng_vq, rng_aq, rng_drop, rng_drloc = jax.random.split(step_rng, 4)

        batch_size = batch["times"].shape[0]
        normaliser = state.normaliser

        # sampled queries are SHARED across the batch
        # (``detection/.../tim.py:281-284``): keep the [nq, 2] originals
        # for a single time-MLP pass and broadcast only for labeling
        v_qs = a_qs = v_queries = a_queries = None
        if has_visual:
            v_qs = Q.sample_train_queries(rng_vq, train_pool, num_queries)
            v_queries = jnp.broadcast_to(v_qs[None],
                                         (batch_size, num_queries, 2))
        if has_audio:
            a_qs = Q.sample_train_queries(rng_aq, train_pool, num_queries)
            a_queries = jnp.broadcast_to(a_qs[None],
                                         (batch_size, num_queries, 2))

        nv = num_queries if has_visual else 0
        na = num_queries if has_audio else 0

        def loss_fn(params):
            variables = {"params": params}

            # batch-identical query intervals: encode once + broadcast
            # (exact — same values; backward of the broadcast sums the
            # batch contributions). Saves the [B, 2*nq, 2] rows through
            # the 3-layer time MLP forward AND backward.
            def enc(t):
                return model.apply(variables, t,
                                   method=TimDetection.encode_times)

            te_parts = [enc(batch["times"])]
            for qs in (v_qs, a_qs):
                if qs is not None:
                    te_q = enc(qs[None])                    # [1, nq, d]
                    te_parts.append(jnp.broadcast_to(
                        te_q, (batch_size,) + te_q.shape[1:]))
            te = jnp.concatenate(te_parts, axis=1)
            cls_logits, reg_preds, ctx = model.apply(
                variables, batch.get("v_feats"), batch.get("a_feats"), te,
                nv, na, deterministic=False, rngs={"dropout": rng_drop},
                method=TimDetection.encoder_forward)

            metrics = {}
            total = jnp.float32(0.0)
            norm = normaliser
            if has_visual:
                v_labels_raw = (
                    jnp.stack([batch["verb"], batch["noun"],
                               batch["action"]], axis=-1)
                    if len(cfg.visual_classes) == 3
                    else batch["action"][..., None])
                v_targets, v_labels, v_ious = Q.label_queries(
                    v_queries, batch["v_gt_segments"], v_labels_raw,
                    cfg.iou_threshold)
                v_cls, v_reg, norm, v_pos = _modality_losses(
                    cls_logits, reg_preds[0], v_targets, v_labels, v_ious,
                    cfg, tcfg, norm, "visual")
                metrics.update(loss_visual=v_cls, loss_visual_reg=v_reg,
                               num_pos_visual=v_pos)
                total = total + v_cls + v_reg
            if has_audio:
                a_targets, a_labels, a_ious = Q.label_queries(
                    a_queries, batch["a_gt_segments"],
                    batch["class_id"][..., None], cfg.iou_threshold)
                a_cls, a_reg, norm, a_pos = _modality_losses(
                    cls_logits, reg_preds[1], a_targets, a_labels, a_ious,
                    cfg, tcfg, norm, "audio")
                metrics.update(loss_audio=a_cls, loss_audio_reg=a_reg,
                               num_pos_audio=a_pos)
                if has_visual:
                    total = total + tcfg.lambda_audio * (a_cls + a_reg)
                else:
                    total = total + a_cls + a_reg

            if tcfg.lambda_drloc > 0.0:
                def mlp_apply(pairs):
                    return model.apply(variables, pairs,
                                       method=TimDetection.drloc)
                nf = cfg.num_feats
                if cfg.input_modality == "audio_visual":
                    dr = L.drloc_loss(rng_drloc, ctx[:, :nf],
                                      ctx[:, nf:2 * nf], mlp_apply,
                                      tcfg.m_drloc)
                else:
                    dr = L.drloc_loss(rng_drloc, ctx, ctx, mlp_apply,
                                      tcfg.m_drloc)
                total = total + tcfg.lambda_drloc * dr
                metrics["loss_drloc"] = dr

            metrics["loss"] = total
            return total, (metrics, norm)

        (_, (metrics, new_norm)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        metrics["grad_norm"] = optax_global_norm(grads)
        metrics["normaliser"] = new_norm
        state = state.apply_gradients(grads, normaliser=new_norm)
        return state, metrics

    return train_step


def make_bank_train_step(
    model: TimDetection,
    cfg: DetectionConfig,
    tcfg: TrainConfig,
    v_bank=None,
    a_bank=None,
    num_queries: int | None = None,
):
    """Detection train step reading features from device-resident banks:
    the batch carries ``feat_indices`` [B, F] int32 (see
    ``tim_tpu.data.device_bank.DetectionWindowTables``)."""
    from tim_tpu.data.device_bank import gather_window_batch

    base = make_train_step(model, cfg, tcfg, num_queries)

    def step(state: TrainState, batch: Dict, rng: jax.Array):
        aug_rng = jax.random.fold_in(
            jax.random.fold_in(rng, state.step), 11)
        v, a = gather_window_batch(
            v_bank, a_bank, batch["feat_indices"], rng=aug_rng)
        full = {k: v2 for k, v2 in batch.items() if k != "feat_indices"}
        if v is not None:
            full["v_feats"] = v
        if a is not None:
            full["a_feats"] = a
        return base(state, full, rng)

    return step


def make_val_step(
    model: TimDetection,
    cfg: DetectionConfig,
    tcfg: TrainConfig,
):
    """Validation losses on the fixed inference grid, eval mode — the
    reference validates via ``forward_inference(label_queries=True)`` with
    dropout off (``detection/scripts/test.py:77-314``). The normaliser is
    read from state but not advanced."""
    grid = jnp.asarray(Q.generate_query_pyramid(cfg.inference_query_size))
    nq = grid.shape[0]
    has_visual = "visual" in cfg.data_modality
    has_audio = "audio" in cfg.data_modality

    def val_step(state: TrainState, batch: Dict):
        batch_size = batch["times"].shape[0]
        queries = jnp.broadcast_to(grid[None], (batch_size, nq, 2))
        nv = nq if has_visual else 0
        na = nq if has_audio else 0

        variables = {"params": state.params}
        # fixed grid: encode its intervals once + broadcast (the
        # inference step's trick, exact for the val losses too)
        te_feat = model.apply(variables, batch["times"],
                              method=TimDetection.encode_times)
        te_query = model.apply(variables, grid[None],
                               method=TimDetection.encode_times)
        te_query = jnp.broadcast_to(
            te_query, (batch_size,) + te_query.shape[1:])
        parts = [te_feat]
        if has_visual:
            parts.append(te_query)
        if has_audio:
            parts.append(te_query)
        te = jnp.concatenate(parts, axis=1)
        cls_logits, reg_preds, _ = model.apply(
            variables, batch.get("v_feats"), batch.get("a_feats"), te,
            nv, na, deterministic=True, shared_queries=True,
            method=TimDetection.encoder_forward)

        metrics = {}
        total = jnp.float32(0.0)
        norm = state.normaliser
        if has_visual:
            v_labels_raw = (
                jnp.stack([batch["verb"], batch["noun"], batch["action"]],
                          axis=-1)
                if len(cfg.visual_classes) == 3
                else batch["action"][..., None])
            v_targets, v_labels, v_ious = Q.label_queries(
                queries, batch["v_gt_segments"], v_labels_raw,
                cfg.iou_threshold)
            v_cls, v_reg, _, _ = _modality_losses(
                cls_logits, reg_preds[0], v_targets, v_labels, v_ious,
                cfg, tcfg, norm, "visual", update_normaliser=False)
            metrics.update(loss_visual=v_cls, loss_visual_reg=v_reg)
            total = total + v_cls + v_reg
        if has_audio:
            a_targets, a_labels, a_ious = Q.label_queries(
                queries, batch["a_gt_segments"],
                batch["class_id"][..., None], cfg.iou_threshold)
            a_cls, a_reg, _, _ = _modality_losses(
                cls_logits, reg_preds[1], a_targets, a_labels, a_ious,
                cfg, tcfg, norm, "audio", update_normaliser=False)
            metrics.update(loss_audio=a_cls, loss_audio_reg=a_reg)
            if has_visual:
                total = total + tcfg.lambda_audio * (a_cls + a_reg)
            else:
                total = total + a_cls + a_reg
        metrics["loss"] = total
        return metrics

    return val_step


def make_inference_step(
    model: TimDetection,
    cfg: DetectionConfig,
    top_k: int | None = None,
):
    """Returns infer_step(params, batch) -> dict with per-query sigmoid
    scores and proposals denormalized to video time, mirroring the dense
    extraction dump (``detection/scripts/extract_feats.py:68-139``,
    ``meters.py`` FeatureMeter: ``clamp(reg)*win_size + win_start``).

    ``top_k``: emit only the k best classes per query as
    ``(<head>_topk_values, <head>_topk_classes)`` instead of the dense
    [B, nq, C] score matrices — the eval chain thresholds at ~0.03 right
    after the dump, so shipping the top-k slashes device->host transfer
    ~C/k x with identical downstream results whenever every
    above-threshold class fits in k (``threshold_predictions_topk``
    checks and warns otherwise)."""
    grid = jnp.asarray(Q.generate_query_pyramid(cfg.inference_query_size))
    nq = grid.shape[0]
    has_visual = "visual" in cfg.data_modality
    has_audio = "audio" in cfg.data_modality

    def infer_step(params, batch):
        variables = {"params": params}
        batch_size = batch["times"].shape[0]
        queries = jnp.broadcast_to(grid[None], (batch_size, nq, 2))
        nv = nq if has_visual else 0
        na = nq if has_audio else 0

        # The query grid is identical for every window: encode its time
        # intervals once and broadcast, instead of pushing B copies
        # through the 3-layer time MLP.
        te_feat = model.apply(variables, batch["times"],
                              method=TimDetection.encode_times)
        te_query = model.apply(variables, grid[None],
                               method=TimDetection.encode_times)
        te_query = jnp.broadcast_to(
            te_query, (batch_size,) + te_query.shape[1:])
        parts = [te_feat]
        if has_visual:
            parts.append(te_query)
        if has_audio:
            parts.append(te_query)
        te = jnp.concatenate(parts, axis=1)
        cls_logits, reg_preds, _ = model.apply(
            variables, batch.get("v_feats"), batch.get("a_feats"), te,
            nv, na, deterministic=True, shared_queries=True,
            method=TimDetection.encoder_forward)

        win_start = batch["window_start"][:, None, None]
        win_size = batch["window_size"][:, None, None]

        def scores_out(out, name, logits):
            probs = jax.nn.sigmoid(logits.astype(jnp.float32))
            if top_k is None:
                out[name] = probs
                return
            k = min(top_k, probs.shape[-1])
            vals, idx = jax.lax.top_k(probs, k)
            base = name.split("_")[0]
            out[f"{base}_topk_values"] = vals
            out[f"{base}_topk_classes"] = idx.astype(jnp.int32)

        out = {"queries": queries * win_size + win_start}
        if has_visual:
            scores_out(out, "v_scores", cls_logits[2])
            if len(cfg.visual_classes) == 3:
                scores_out(out, "verb_scores", cls_logits[0])
                scores_out(out, "noun_scores", cls_logits[1])
            out["v_proposals"] = (
                jnp.clip(reg_preds[0].astype(jnp.float32), 0.0, 1.0)
                * win_size + win_start)
        if has_audio:
            scores_out(out, "a_scores", cls_logits[3])
            out["a_proposals"] = (
                jnp.clip(reg_preds[1].astype(jnp.float32), 0.0, 1.0)
                * win_size + win_start)
        return out

    return infer_step
