"""Pallas TPU kernel: fused TIM query-block attention.

The hot attention pattern in TIM is hundreds of interval-query tokens each
attending to ~100 context keys plus themselves. The XLA path materializes
the [B, H, Nq, F] score/softmax tensors in HBM (fp32: ~650 MB per step at
EPIC detection shapes). This kernel streams query tiles through VMEM and
fuses scores -> stable softmax(+self logit) -> PV into one pass, so the
only HBM traffic is q/k/v in and the output tile out.

Used for the inference path (eval/extraction/serving); training keeps the
jnp formulation (attention dropout needs materialized weights, and XLA's
backward is fine there). Exactness vs the jnp/dense-mask path is covered
by tests (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _query_block_kernel(qq_ref, kc_ref, kq_ref, vc_ref, vq_ref, out_ref,
                        *, scale: float):
    """One (batch*head, query-tile) program.

    Block shapes: qq/kq/vq/out [1, TQ, dh]; kc/vc [1, F, dh].
    """
    qq = qq_ref[0].astype(jnp.float32) * scale          # [TQ, dh]
    kc = kc_ref[0].astype(jnp.float32)                  # [F, dh]
    kq = kq_ref[0].astype(jnp.float32)                  # [TQ, dh]

    scores = jax.lax.dot_general(
        qq, kc, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # [TQ, F]
    self_scores = jnp.sum(qq * kq, axis=-1, keepdims=True)  # [TQ, 1]

    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), self_scores)
    e_ctx = jnp.exp(scores - m)
    e_self = jnp.exp(self_scores - m)
    denom = jnp.sum(e_ctx, axis=-1, keepdims=True) + e_self

    vc = vc_ref[0].astype(jnp.float32)
    vq = vq_ref[0].astype(jnp.float32)
    out = jnp.dot(e_ctx / denom, vc, preferred_element_type=jnp.float32)
    out = out + (e_self / denom) * vq
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_q", "interpret"))
def query_block_attention(
    qq: jnp.ndarray,   # [B, H, Nq, dh]
    kc: jnp.ndarray,   # [B, H, F, dh]
    kq: jnp.ndarray,   # [B, H, Nq, dh]
    vc: jnp.ndarray,   # [B, H, F, dh]
    vq: jnp.ndarray,   # [B, H, Nq, dh]
    *,
    tile_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax over [context keys ‖ self] per query token, fused."""
    b, h, nq, dh = qq.shape
    f = kc.shape[2]
    scale = 1.0 / (dh ** 0.5)

    pad = (-nq) % tile_q
    if pad:
        qq = jnp.pad(qq, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kq = jnp.pad(kq, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vq = jnp.pad(vq, ((0, 0), (0, 0), (0, pad), (0, 0)))
    nq_p = nq + pad

    bh = b * h
    qq_r = qq.reshape(bh, nq_p, dh)
    kq_r = kq.reshape(bh, nq_p, dh)
    vq_r = vq.reshape(bh, nq_p, dh)
    kc_r = kc.reshape(bh, f, dh)
    vc_r = vc.reshape(bh, f, dh)

    grid = (bh, nq_p // tile_q)
    q_spec = pl.BlockSpec((1, tile_q, dh), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    ctx_spec = pl.BlockSpec((1, f, dh), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_query_block_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, nq_p, dh), qq.dtype),
        grid=grid,
        in_specs=[q_spec, ctx_spec, q_spec, ctx_spec, q_spec],
        out_specs=q_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * nq_p * f * dh * 2,
            bytes_accessed=(3 * bh * nq_p * dh + 2 * bh * f * dh) * 2,
            transcendentals=bh * nq_p * (f + 1),
        ),
        interpret=interpret,
    )(qq_r, kc_r, kq_r, vc_r, vq_r)

    out = out.reshape(b, h, nq_p, dh)
    return out[:, :, :nq]


def supports_pallas() -> bool:
    """True when the default backend compiles Pallas TPU kernels."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")
