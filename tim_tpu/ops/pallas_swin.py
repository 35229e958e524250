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
softmax, bf16 PV).

Backward (``jax.custom_vjp``): the reference's Omnivore trunk is a
trainable torch module (``omnivore/models/swin_transformer.py``), so
the kernel must back a finetune step too. N = 784 fits in VMEM, so the
backward recomputes scores + softmax exactly (same fp32 ops as the
forward — no saved stats needed) and emits dq/dk/dv per window plus
``dab`` accumulated over the ``rep`` windows sharing a bias type: the
dab output block is indexed ``batch // rep`` like ``ab``, and with the
batch axis innermost the kernel revisits the same VMEM block for
``rep`` consecutive grid steps (init on the first, add on the rest) —
one HBM write-back per (type, head). That keeps training free of the
[BW, H, N, N] score/probability residuals that OOM the XLA path at
batch 16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# The backward kernel's per-step live set (~18 MB: the ab bias block +
# recomputed fp32 scores/probs + dp + ds + the fp32 dab output block +
# bf16 transpose copies, each [784, 784]) exceeds the TPU compiler's
# default 16 MB scoped-vmem budget, which fails the COMPILE ("Ran out
# of memory in memory space vmem ... scoped allocation", measured
# round 5). Any top-level jit that differentiates through
# ``window_attention_flash`` must raise the budget via
# ``jax.jit(..., compiler_options=SWIN_FLASH_TRAIN_COMPILER_OPTIONS)``
# — compiler_options only reach the remote compiler from the TOP-LEVEL
# jit (CLAUDE.md). Forward-only programs don't need it (~8 MB live).
SWIN_FLASH_TRAIN_COMPILER_OPTIONS = {
    "xla_tpu_scoped_vmem_limit_kib": "32768"}


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


def _specs(bw: int, h: int, n: int, dh: int, rep: int):
    qkv_spec = pl.BlockSpec((1, 1, n, dh), lambda hi, bi: (bi, hi, 0, 0))
    # batch innermost: consecutive steps share the ab block for `rep`
    # iterations, so the pipeline keeps it resident instead of
    # re-fetching n_types*H*N^2 data BW*H times.
    ab_spec = pl.BlockSpec(
        (1, 1, n, n), lambda hi, bi: (bi // rep, hi, 0, 0))
    return qkv_spec, ab_spec


def _fwd_call(q, k, v, ab, sm_scale, interpret):
    bw, h, n, dh = q.shape
    rep = bw // ab.shape[0]
    qkv_spec, ab_spec = _specs(bw, h, n, dh, rep)
    return pl.pallas_call(
        functools.partial(_kernel, sm_scale=float(sm_scale)),
        grid=(h, bw),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, ab_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((bw, h, n, dh), q.dtype),
        interpret=interpret,
    )(q, k, v, ab)


def _bwd_kernel(q_ref, k_ref, v_ref, ab_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dab_ref, *,
                sm_scale: float, rep: int):
    """Recompute p exactly (same fp32 ops as the forward), then

        dv        = p^T do
        dp        = do v^T
        ds        = p * (dp - rowsum(dp * p))      (softmax backward)
        dq        = (ds @ k) * sm_scale
        dk        = (ds^T @ q) * sm_scale
        dab[type] = sum over the type's `rep` windows of ds

    fp32 intermediates cast to the operand dtype before each MXU matmul
    (the same bf16-inputs / fp32-accumulate convention as the forward)."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = s * sm_scale + ab_ref[0, 0].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)

    # transpose-then-dot (not axis-0 contractions) — the idiom the public
    # TPU flash kernel's backward uses; Mosaic lowers it reliably
    dv = jax.lax.dot(                              # [N_k, dh] = p^T do
        p.T.astype(v.dtype), do,
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(                      # [N_q, N_k] = do v^T
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    dsc = (ds * sm_scale).astype(q.dtype)
    dq = jax.lax.dot(                              # [N_q, dh] = ds k
        dsc, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot(                              # [N_k, dh] = ds^T q
        dsc.T, q, preferred_element_type=jnp.float32)

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    # dab block (bi // rep, hi) is revisited for `rep` consecutive grid
    # steps (batch innermost): initialize on the type's first window,
    # accumulate on the rest — written back to HBM once per (type, head).
    bi = pl.program_id(1)
    dab = ds.astype(dab_ref.dtype)

    @pl.when(bi % rep == 0)
    def _init():
        dab_ref[0, 0] = dab

    @pl.when(bi % rep != 0)
    def _accum():
        dab_ref[0, 0] += dab


def _bwd_call(q, k, v, ab, do, sm_scale, interpret):
    bw, h, n, dh = q.shape
    n_types = ab.shape[0]
    rep = bw // n_types
    qkv_spec, ab_spec = _specs(bw, h, n, dh, rep)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, sm_scale=float(sm_scale), rep=rep),
        grid=(h, bw),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, ab_spec, qkv_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec, ab_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bw, h, n, dh), q.dtype),
            jax.ShapeDtypeStruct((bw, h, n, dh), k.dtype),
            jax.ShapeDtypeStruct((bw, h, n, dh), v.dtype),
            jax.ShapeDtypeStruct((n_types, h, n, n), ab.dtype),
        ],
        interpret=interpret,
    )(q, k, v, ab, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, ab, sm_scale, interpret):
    return _fwd_call(q, k, v, ab, sm_scale, interpret)


def _flash_fwd(q, k, v, ab, sm_scale, interpret):
    # Residuals are the inputs themselves; the backward recomputes the
    # softmax in VMEM, so no [BW, H, N, N] tensor ever reaches HBM.
    return _fwd_call(q, k, v, ab, sm_scale, interpret), (q, k, v, ab)


def _flash_bwd(sm_scale, interpret, res, do):
    q, k, v, ab = res
    return _bwd_call(q, k, v, ab, do, sm_scale, interpret)


_flash.defvjp(_flash_fwd, _flash_bwd)


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
    in ``q.dtype``. Differentiable (custom VJP; flash-style recompute
    backward with type-accumulated dab).
    """
    bw, h, n, dh = q.shape
    n_types = ab.shape[0]
    if bw % n_types:
        raise ValueError(f"n_types {n_types} must divide batch {bw}")
    if ab.shape != (n_types, h, n, n):
        raise ValueError(f"ab shape {ab.shape} != {(n_types, h, n, n)}")
    return _flash(q, k, v, ab, float(sm_scale), bool(interpret))


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
