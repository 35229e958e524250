"""TIM attention, TPU-first.

The reference builds a dense [S, S] boolean mask in which every token may
attend to (a) all context tokens and (b) itself, then runs a full dense
multi-head attention over it (``recognition/.../models/tim.py:161-168``,
``detection/.../models/tim.py:320-327``). For detection inference the
sequence is ~100 context + ~800-1600 query tokens, so >90% of the S x S
score matrix is masked out yet still computed.

Here we exploit the structure instead of masking it:

- context tokens (first ``num_ctx``) run dense self-attention over context
  only — an [F, F] block;
- query tokens attend to the F context keys plus exactly one extra key:
  themselves. That is an [Nq, F] cross-attention plus a per-row "self"
  score, i.e. softmax over F+1 logits per query.

This is mathematically *exact* w.r.t. the reference mask — verified against
``dense_masked_attention`` in tests — and reduces attention FLOPs/HBM
traffic from O((F+Nq)^2) to O(F^2 + Nq*F): ~17x fewer score FLOPs for the
EPIC detection config. Both blocks are clean batched matmuls that XLA tiles
straight onto the MXU; no gather/scatter, no dynamic shapes.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=1)
def _pallas_enabled() -> bool:
    # Opt-in: at EPIC shapes XLA's batched einsum beats the hand kernel
    # (measured 902 vs 755 windows/s); the kernel may still win at much
    # longer query counts where HBM intermediates dominate.
    if not os.environ.get("TIM_TPU_USE_PALLAS_ATTENTION"):
        return False
    from tim_tpu.ops.pallas_attention import supports_pallas
    return supports_pallas()


def tim_attention_mask(seq_len: int, num_ctx: int) -> jnp.ndarray:
    """Boolean [S, S] mask, True = *allowed*. Context columns + diagonal.

    Semantics of ``masks[:, :num_feats]=0; fill_diagonal_(0)`` in the
    reference (where True = disallowed) — inverted here to additive-mask
    friendly "True = attend".
    """
    allowed = jnp.zeros((seq_len, seq_len), dtype=bool)
    allowed = allowed.at[:, :num_ctx].set(True)
    allowed = allowed | jnp.eye(seq_len, dtype=bool)
    return allowed


def _attn_dropout(rng, weights, rate: float, deterministic: bool,
                  bits: int = 32):
    """Dropout on post-softmax attention weights (torch MHA placement).

    ``bits=8`` uses the uint8-mask variant (``ops/dropout.py``) — 4x
    fewer generated random bits, statistically equivalent."""
    if deterministic or rate == 0.0:
        return weights
    if rng is None:
        raise ValueError(
            "attention dropout with deterministic=False requires a "
            "dropout rng; pass deterministic=True or dropout_rate=0.0 "
            "for eval")
    if bits == 8:
        from tim_tpu.ops.dropout import coarse_dropout
        return coarse_dropout(rng, weights, rate)
    keep = jax.random.bernoulli(rng, 1.0 - rate, weights.shape)
    return jnp.where(keep, weights / (1.0 - rate), jnp.zeros_like(weights))


def tim_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_ctx: int,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    score_dtype=None,
    dropout_bits: int = 32,
) -> jnp.ndarray:
    """Structured TIM attention.

    Args:
      q, k, v: [B, H, S, Dh]; the first ``num_ctx`` positions are context
        tokens, the rest are query (CLS) tokens.
      num_ctx: static number of context tokens.
      score_dtype: dtype for scores/softmax; None uses fp32 (the parity
        policy). bf16 scores are the ``ModelConfig.fast_scores`` serving
        knob — the ONLY switch for this behavior, accuracy-qualified in
        tests/test_quant_accuracy.py; the attention *outputs* accumulate
        fp32 either way.

    Returns: [B, H, S, Dh].
    """
    sdt = score_dtype if score_dtype is not None else jnp.float32
    orig_dtype = q.dtype
    s = q.shape[2]
    dh = q.shape[3]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32)).astype(orig_dtype)

    qc, qq = q[:, :, :num_ctx] * scale, q[:, :, num_ctx:]
    kc, kq = k[:, :, :num_ctx], k[:, :, num_ctx:]
    vc, vq = v[:, :, :num_ctx], v[:, :, num_ctx:]

    if not deterministic and dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError(
                "tim_attention: dropout_rate > 0 with deterministic="
                "False requires dropout_rng (module callers pass "
                "make_rng('dropout')); pass deterministic=True or "
                "dropout_rate=0.0 for eval")
        rng_c, rng_q = jax.random.split(dropout_rng)
    else:
        rng_c = rng_q = None

    # --- context block: dense self-attention over context tokens ----------
    ctx_scores = jnp.einsum(
        "bhqd,bhkd->bhqk", qc, kc, preferred_element_type=sdt
    )
    ctx_w = jax.nn.softmax(ctx_scores, axis=-1)
    ctx_w = _attn_dropout(rng_c, ctx_w, dropout_rate, deterministic,
                          dropout_bits)
    ctx_out = jnp.einsum(
        "bhqk,bhkd->bhqd", ctx_w.astype(orig_dtype), vc,
        preferred_element_type=jnp.float32,
    ).astype(orig_dtype)

    if s == num_ctx:
        return ctx_out

    # --- query block: cross-attention to context + self -------------------
    # (the Pallas kernel has fp32 internals — bf16 score requests fall
    # through to the XLA path so fast_scores is never silently ignored)
    if deterministic and sdt == jnp.float32 and _pallas_enabled():
        # fused VMEM kernel: no [B, H, Nq, F] HBM intermediates
        from tim_tpu.ops.pallas_attention import query_block_attention
        qry_out = query_block_attention(qq, kc, kq, vc, vq)
        return jnp.concatenate([ctx_out, qry_out], axis=2)

    qq = qq * scale
    qry_scores = jnp.einsum(
        "bhqd,bhkd->bhqk", qq, kc, preferred_element_type=sdt
    )                                                       # [B,H,Nq,F]
    self_scores = jnp.sum(
        qq.astype(sdt) * kq.astype(sdt), axis=-1,
        keepdims=True,
    )                                                       # [B,H,Nq,1]
    # Joint softmax over [context ‖ self] computed without concatenating —
    # the concat forces a second [B, H, Nq, F+1] fp32 HBM tensor that XLA
    # can't fuse away (measured 4x slower for this block).
    m = jnp.maximum(jnp.max(qry_scores, axis=-1, keepdims=True),
                    self_scores)
    e_ctx = jnp.exp(qry_scores - m)
    e_self = jnp.exp(self_scores - m)
    denom = jnp.sum(e_ctx, axis=-1, keepdims=True) + e_self
    w_ctx = e_ctx / denom
    w_self = e_self / denom
    if not deterministic and dropout_rate > 0.0:
        rng_cq, rng_sq = jax.random.split(rng_q)
        w_ctx = _attn_dropout(rng_cq, w_ctx, dropout_rate, deterministic,
                              dropout_bits)
        w_self = _attn_dropout(rng_sq, w_self, dropout_rate,
                               deterministic, dropout_bits)
    qry_out = jnp.einsum(
        "bhqk,bhkd->bhqd", w_ctx.astype(orig_dtype), vc,
        preferred_element_type=jnp.float32,
    ).astype(orig_dtype)
    qry_out = qry_out + w_self.astype(orig_dtype) * vq

    return jnp.concatenate([ctx_out, qry_out], axis=2)


def dense_masked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    allowed: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Reference-equivalent dense masked attention (parity oracle).

    ``allowed`` is a boolean [S, S] (True = may attend). Used in tests to
    prove ``tim_attention`` matches the reference mask exactly; also the
    fallback for arbitrary masks.
    """
    orig_dtype = q.dtype
    dh = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.where(allowed[None, None], scores, jnp.float32(-jnp.inf))
    w = jax.nn.softmax(scores, axis=-1)
    w = _attn_dropout(dropout_rng, w, dropout_rate, deterministic)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", w.astype(orig_dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(orig_dtype)
