"""Loss primitives, jit-compatible and shape-static.

Functional replacements for the reference's loss stack:
- label-smoothed CE with ignore_index (``torch.nn.CrossEntropyLoss`` as used
  in ``recognition/scripts/train.py:46-49``),
- RetinaNet sigmoid focal loss
  (``detection/.../models/helpers/losses/sigmoid.py:4-51``),
- 1-D center DIoU loss (``detection/.../models/helpers/losses/iou.py:3-65``),
- mixup (``recognition/.../utils/mixup.py:4-39``),
- dense relative localization sampling
  (``recognition/.../models/helpers/losses/drloc.py``).

All masked reductions use a weight vector instead of boolean indexing so
shapes stay static under jit.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    label_smoothing: float = 0.0,
    ignore_index: int = -1,
    weights: jnp.ndarray | None = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Label-smoothed cross entropy over the last axis.

    Torch semantics: the target distribution is
    ``(1 - eps) * onehot + eps / C`` and rows whose label equals
    ``ignore_index`` contribute nothing (mean divides by the count of
    non-ignored rows).
    """
    num_classes = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)

    # Out-of-range labels are treated as ignored rather than producing a
    # silent OOB gather (torch raises; raising is impossible under jit).
    valid = (labels != ignore_index) & (labels >= 0) & \
        (labels < num_classes)
    safe_labels = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(logp, axis=-1)
    loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    loss = jnp.where(valid, loss, 0.0)
    if weights is not None:
        loss = loss * weights

    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(loss) / count


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    *,
    alpha: float = 0.25,
    gamma: float = 2.0,
    weights: jnp.ndarray | None = None,
    reduction: str = "none",
) -> jnp.ndarray:
    """RetinaNet focal loss on (soft) binary targets, same math as the
    reference (``sigmoid.py:35-51``)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    # Numerically-stable BCE-with-logits.
    ce = jnp.clip(logits, min=0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    if weights is not None:
        loss = loss * weights
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def sigmoid_focal_loss_smoothed(
    logits: jnp.ndarray,        # [N, C]
    labels: jnp.ndarray,        # [N] int, -1 = negative (floor everywhere)
    smoothing: float,
    *,
    alpha: float = 0.25,
    gamma: float = 2.0,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Focal loss against the detection smoothed one-hot targets WITHOUT
    materializing the [N, C] target tensor: targets are
    ``floor + s * onehot`` (``smooth_positive_labels``), generated inline
    from an iota so XLA fuses target construction into the loss
    elementwise pass — at EPIC scale the explicit target tensor is
    ~0.4 GB fp32 per step. Returns the weighted SUM (the reduction the
    detection loss uses)."""
    n, c = logits.shape
    floor = (1.0 - smoothing) / (c + 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, c), 1)
    targets = floor + smoothing * (col == labels[:, None]).astype(
        jnp.float32)

    x = logits.astype(jnp.float32)
    p = jax.nn.sigmoid(x)
    ce = jnp.clip(x, min=0.0) - x * targets + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    if weights is not None:
        loss = loss * weights[:, None]
    return jnp.sum(loss)


def ctr_diou_loss_1d(
    input_offsets: jnp.ndarray,
    target_offsets: jnp.ndarray,
    *,
    weights: jnp.ndarray | None = None,
    reduction: str = "none",
    eps: float = 1e-8,
) -> jnp.ndarray:
    """1-D distance-IoU on (left, right) offsets from a shared center,
    matching ``iou.py:3-65`` (Zheng et al., arXiv 1911.08287)."""
    input_offsets = input_offsets.astype(jnp.float32)
    target_offsets = target_offsets.astype(jnp.float32)

    lp, rp = input_offsets[..., 0], input_offsets[..., 1]
    lg, rg = target_offsets[..., 0], target_offsets[..., 1]

    inter = jnp.minimum(lp, lg) + jnp.minimum(rp, rg)
    union = (lp + rp) + (lg + rg) - inter
    iou = inter / jnp.clip(union, min=eps)

    len_c = jnp.maximum(lp, lg) + jnp.maximum(rp, rg)
    rho = 0.5 * (rp - lp - rg + lg)
    loss = 1.0 - iou + jnp.square(rho / jnp.clip(len_c, min=eps))

    if weights is not None:
        loss = loss * weights
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


# ---------------------------------------------------------------------------
# Mixup
# ---------------------------------------------------------------------------

def mixup(
    rng: jax.Array,
    inputs: Tuple[jnp.ndarray, ...],
    alpha: float,
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray, jnp.ndarray]:
    """Beta(alpha, alpha)-mixed inputs along the batch axis.

    Returns (mixed_inputs, perm, lam). Labels are not mixed; the paired-
    target criterion uses ``perm``/``lam`` (reference ``mixup.py:24-39``).
    """
    rng_lam, rng_perm = jax.random.split(rng)
    batch = inputs[0].shape[0]
    if alpha > 0:
        lam = jax.random.beta(rng_lam, alpha, alpha)
    else:
        lam = jnp.float32(1.0)
    perm = jax.random.permutation(rng_perm, batch)
    lam_c = lam.astype(inputs[0].dtype)
    mixed = tuple(
        lam_c * x + (1.0 - lam_c) * x[perm] for x in inputs
    )
    return mixed, perm, lam


def mixup_cross_entropy(
    logits: jnp.ndarray,
    labels_a: jnp.ndarray,
    labels_b: jnp.ndarray,
    lam: jnp.ndarray,
    *,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """lam * CE(logits, y_a) + (1-lam) * CE(logits[perm-side], y_b), each
    masked-mean over its own valid rows — mirroring the reference's separate
    ``valid_indices`` / ``valid_b_indices`` selections
    (``recognition/scripts/train.py:223-258``)."""
    loss_a = cross_entropy(logits, labels_a, label_smoothing=label_smoothing)
    loss_b = cross_entropy(logits, labels_b, label_smoothing=label_smoothing)
    return lam * loss_a + (1.0 - lam) * loss_b


# ---------------------------------------------------------------------------
# Dense relative localization (DRLoc)
# ---------------------------------------------------------------------------

def drloc_loss(
    rng: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    mlp_apply: Callable[[jnp.ndarray], jnp.ndarray],
    m: int,
) -> jnp.ndarray:
    """Dense relative localization loss.

    Samples ``m`` random position pairs per batch row from token sequences
    ``x1``/``x2`` (pass the same array twice for the unimodal variant), asks
    the drloc MLP to predict |pos1 - pos2| / L from the concatenated token
    pair, and returns the L1 error (``drloc.py:17-41``). Sampling runs under
    jit via jax.random (the reference sampled on CPU).
    """
    n, l, _ = x1.shape
    rng1, rng2 = jax.random.split(rng)
    pos_1 = jax.random.randint(rng1, (n, m), 0, l)
    pos_2 = jax.random.randint(rng2, (n, m), 0, l)

    delta = jnp.abs((pos_1 - pos_2).astype(jnp.float32)) / l

    pts_1 = jnp.take_along_axis(x1, pos_1[..., None], axis=1)  # [n, m, D]
    pts_2 = jnp.take_along_axis(x2, pos_2[..., None], axis=1)
    pred = mlp_apply(jnp.concatenate([pts_1, pts_2], axis=-1))  # [n, m]
    return jnp.mean(jnp.abs(delta - pred.astype(jnp.float32)))


# ---------------------------------------------------------------------------
# Detection label targets
# ---------------------------------------------------------------------------

def smooth_positive_labels(
    labels: jnp.ndarray, num_classes: int, smoothing: float
) -> jnp.ndarray:
    """One-hot labels smoothed the detection way
    (``detection/.../models/tim.py:157-184``): negatives (label == -1) map to
    a dummy class C that is dropped, leaving a uniform floor
    ``(1 - s) / (C + 1)`` everywhere; positives peak at
    ``s + (1 - s) / (C + 1)``."""
    mapped = jnp.where(labels == -1, num_classes, labels)
    onehot = jax.nn.one_hot(mapped, num_classes + 1, dtype=jnp.float32)
    soft = onehot * smoothing + (1.0 - smoothing) / (num_classes + 1)
    return soft[..., :-1]
