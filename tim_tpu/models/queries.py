"""Multi-scale interval query pyramid + IoU-based query labeling.

The detection model scores a dense pyramid of candidate intervals instead
of GT-aligned queries. This module reproduces the semantics of
``detection/.../models/tim.py:144-270`` as static numpy (pyramid) and pure
jit-compatible functions (labeling) — the reference runs labeling inside
``forward_train`` on tensors, so it maps 1:1 onto vectorized jnp ops.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tim_tpu.ops.intervals import pairwise_iou_1d
from tim_tpu.ops.losses import smooth_positive_labels


def generate_query_pyramid(query_size: float) -> np.ndarray:
    """Intervals of geometrically growing size tiled at 50% overlap over
    [0, 1] (``detection/.../tim.py:144-155``). Returns [Nq, 2] float32.

    Each level: starts = arange(0, 1, size/2), ends = starts + size,
    rounded to 3 decimals; sizes double until >= 1.0.
    """
    levels = []
    size = query_size
    while size < 1.0:
        starts = np.arange(0.0, 1.0, step=size / 2, dtype=np.float32)
        ends = starts + np.float32(size)
        level = np.stack([starts, ends], axis=-1)
        # float32 rounding matches torch.round(decimals=3); the only
        # residual divergence vs the reference is a 1-ulp arange
        # difference on the finest (0.005) train-pool level, which can
        # flip a 0.0005 rounding boundary by 0.001 — immaterial (the pool
        # is randomly subsampled and IoU-thresholded at 0.6).
        levels.append(np.round(level, 3))
        size *= 2
    return np.concatenate(levels, axis=0).astype(np.float32)


def sample_train_queries(
    rng: jax.Array, train_pool: jnp.ndarray, num_queries: int
) -> jnp.ndarray:
    """Random subsample of the train pool, shared across the batch
    (``detection/.../tim.py:281-284``). Static output shape [num_queries, 2].
    """
    idx = jax.random.permutation(rng, train_pool.shape[0])[:num_queries]
    return train_pool[idx]


def label_queries(
    queries: jnp.ndarray,       # [B, Nq, 2] (window-normalized)
    gt_segments: jnp.ndarray,   # [B, Na, 2] zero-padded
    gt_labels: jnp.ndarray,     # [B, Na, L] -1-padded (L in {1, 3})
    iou_threshold: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Assign each query the max-IoU GT segment; negatives (IoU < thr) get
    inf regression targets and -1 labels (``detection/.../tim.py:214-270``).

    Returns:
      query_targets: [B, Nq, 2] (inf rows for negatives)
      query_labels:  [B, Nq, L] int (-1 rows for negatives)
      query_ious:    [B, Nq]
    """
    ious = pairwise_iou_1d(queries, gt_segments)        # [B, Nq, Na]
    # Zero-padded GT rows have zero length; IoU with them is 0, so argmax
    # only selects padding when every IoU is 0 — then iou < thr marks the
    # query negative anyway (labels on padded rows are already -1).
    best = jnp.argmax(ious, axis=-1)                    # [B, Nq]
    best_iou = jnp.take_along_axis(ious, best[..., None], axis=-1)[..., 0]

    targets = jnp.take_along_axis(
        gt_segments, best[..., None], axis=1)           # [B, Nq, 2]
    labels = jnp.take_along_axis(
        gt_labels, best[..., None], axis=1)             # [B, Nq, L]

    negative = best_iou < iou_threshold
    targets = jnp.where(negative[..., None], jnp.inf, targets)
    labels = jnp.where(negative[..., None], -1, labels)
    return targets, labels, best_iou


def smooth_detection_labels(
    labels: jnp.ndarray,
    visual_classes,
    audio_classes,
    smoothing: float,
    modality: str,
):
    """Expand int labels [.., L] into the smoothed one-hot focal targets
    (``detection/.../tim.py:157-184``)."""
    if modality == "visual":
        out = []
        if labels.shape[-1] == 3:
            out.append(smooth_positive_labels(
                labels[..., 0], visual_classes[0], smoothing))
            out.append(smooth_positive_labels(
                labels[..., 1], visual_classes[1], smoothing))
        else:
            out.extend([None, None])
        out.append(smooth_positive_labels(
            labels[..., -1], visual_classes[-1], smoothing))
        return tuple(out)
    return smooth_positive_labels(labels[..., -1], audio_classes, smoothing)
