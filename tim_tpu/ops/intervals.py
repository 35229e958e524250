"""1-D time-interval (segment) math, fully vectorized for jit.

Replaces the reference's tensor IoU helpers
(``detection/.../models/tim.py:186-212`` get_query_ious,
``detection/eval_detection/nms.py:62-94`` seg_voting) with pure jnp ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def segment_iou_1d(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of segments ``a`` and ``b`` with matching shapes
    [..., 2] (start, end). Returns [...]."""
    inter_start = jnp.maximum(a[..., 0], b[..., 0])
    inter_end = jnp.minimum(a[..., 1], b[..., 1])
    inter = jnp.clip(inter_end - inter_start, min=0.0)
    union = (a[..., 1] - a[..., 0]) + (b[..., 1] - b[..., 0]) - inter
    # inter > 0 implies union > 0, so only 0/0 pairs (e.g. two
    # zero-length [0, 0] padding segments) hit the guard: 0, not NaN
    return inter / jnp.maximum(union, jnp.finfo(jnp.float32).tiny)


def pairwise_iou_1d(
    queries: jnp.ndarray, targets: jnp.ndarray
) -> jnp.ndarray:
    """IoU between every query and every target segment.

    Matches the reference's ``get_query_ious`` semantics
    (``detection/.../models/tim.py:186-212``), including the shift by the
    most-negative target start (a no-op when all segments are >= 0, which
    holds for the clamped, window-normalized inputs, but kept for parity).

    Args:
      queries: [B, Nq, 2]
      targets: [B, Na, 2]
    Returns:
      ious: [B, Nq, Na]
    """
    q_start = queries[..., 0][:, :, None]     # [B, Nq, 1]
    q_end = queries[..., 1][:, :, None]
    t_start = targets[..., 0][:, None, :]     # [B, 1, Na]
    t_end = targets[..., 1][:, None, :]

    # Reference shifts all segments so the most-negative GT start is at 0.
    neg_off = jnp.abs(jnp.clip(jnp.min(targets[..., 0], axis=-1), max=0.0))
    neg_off = neg_off[:, None, None]
    q_start, q_end = q_start + neg_off, q_end + neg_off
    t_start, t_end = t_start + neg_off, t_end + neg_off

    inter = jnp.clip(jnp.minimum(q_end, t_end) - jnp.maximum(q_start, t_start), min=0.0)
    union = (t_end - t_start) + (q_end - q_start) - inter
    return inter / union
