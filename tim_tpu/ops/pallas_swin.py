"""Fused (shifted-)window attention for the Swin3D backbone (Mosaic).

Why this exists: the Omnivore Swin-B trunk
(``feature_extractors/omnivore/omnivore/models/swin_transformer.py``)
uses a (16,7,7) attention window — N = 784 tokens per window — so the
XLA path materializes per-window [heads, 784, 784] fp32 score tensors:
~4.9 GB per 32x224x224 clip across the four stages, touched ~2.5 times
(score write, bias+mask+softmax pass, prob read for the PV matmul).
That is the same O(N^2) HBM-traffic fight the public flash kernel won
on the ViT-L backbone (docs/PERFORMANCE.md, 2.63x) — Pallas wins on
this chip when it REMOVES memory traffic, not when it re-schedules
matmuls.

The public flash kernel cannot be reused here because the additive
attention bias (relative-position bias + shift mask) is shared across
all windows of the same type: its ``ab`` operand must be materialized
at the full [B*nW, H, N, N] batch shape, which re-creates the exact
traffic being removed. This kernel instead takes ``ab`` at its natural
[n_types, H, N, N] shape and indexes it with ``batch // repeats`` from
the BlockSpec index map, so windows sharing a bias re-read the same
block (and with a window-type-major batch layout, consecutive grid
steps revisit the same ``ab`` block, which the Mosaic pipeline does not
re-fetch).

N = 784 fits a single full-sequence VMEM block (scores are 2.4 MB
fp32), so no online-softmax accumulators are needed: the kernel is one
exact softmax-attention per (window, head) —

    scores = (q @ k^T) * sm_scale + ab[type]   (fp32 accumulators)
    out    = softmax(scores) @ v               (probs cast to v.dtype)

matching the XLA path's numerics (bf16 matmul inputs, fp32 scores and
softmax, bf16 PV). Forward-only: the extraction pipeline never
differentiates through the Omnivore trunk (the reference finetunes
VideoMAE, not Omnivore).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(q_ref, k_ref, v_ref, ab_ref, o_ref, *, sm_scale: float):
    q = q_ref[0, 0]                       # [N, dh] (bf16/fp32)
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = s * sm_scale + ab_ref[0, 0].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def window_attention_flash(
    q: jnp.ndarray,            # [BW, H, N, dh]
    k: jnp.ndarray,            # [BW, H, N, dh]
    v: jnp.ndarray,            # [BW, H, N, dh]
    ab: jnp.ndarray,           # [n_types, H, N, N] additive bias
    *,
    sm_scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Window attention with a type-indexed additive bias, fused in VMEM.

    ``n_types`` must divide ``BW``, and the BW axis must be
    window-type-MAJOR: entry ``t * (BW // n_types) + b`` holds batch
    element ``b`` of window type ``t`` (types are contiguous runs).
    Returns ``softmax(q k^T * sm_scale + ab[type]) v`` as [BW, H, N, dh]
    in ``q.dtype``.
    """
    bw, h, n, dh = q.shape
    n_types = ab.shape[0]
    if bw % n_types:
        raise ValueError(f"n_types {n_types} must divide batch {bw}")
    if ab.shape != (n_types, h, n, n):
        raise ValueError(f"ab shape {ab.shape} != {(n_types, h, n, n)}")
    rep = bw // n_types

    qkv_spec = pl.BlockSpec((1, 1, n, dh), lambda hi, bi: (bi, hi, 0, 0))
    ab_spec = pl.BlockSpec(
        (1, 1, n, n), lambda hi, bi: (bi // rep, hi, 0, 0))
    # batch innermost: consecutive steps share the ab block for `rep`
    # iterations, so the pipeline keeps it resident instead of
    # re-fetching n_types*H*N^2 data BW*H times.
    return pl.pallas_call(
        functools.partial(_kernel, sm_scale=float(sm_scale)),
        grid=(h, bw),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, ab_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((bw, h, n, dh), q.dtype),
        interpret=interpret,
    )(q, k, v, ab)


def window_type_major(x: jnp.ndarray, n_types: int) -> jnp.ndarray:
    """[B*nW, ...] batch-major (window fastest, as produced by
    ``window_partition``) -> window-type-major (batch fastest)."""
    b = x.shape[0] // n_types
    return x.reshape(b, n_types, *x.shape[1:]).swapaxes(0, 1).reshape(
        x.shape)


def window_type_major_inverse(x: jnp.ndarray, n_types: int) -> jnp.ndarray:
    b = x.shape[0] // n_types
    return x.reshape(n_types, b, *x.shape[1:]).swapaxes(0, 1).reshape(
        x.shape)
