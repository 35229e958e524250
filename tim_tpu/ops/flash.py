"""Differentiable wrapper around the public Pallas TPU flash-attention
kernel for sequence lengths that are not multiples of 128.

The kernel's forward accepts a single full-sequence block at any S (the
shipped ViT-L config: S=1568, measured fastest), but its backward
(`_flash_attention_dkv_kernel`) tiles lane-wise and requires every block
size to be a multiple of 128 — so ``jax.grad`` through a full-S=1568
block crashes. This wrapper pads S up to the next multiple of 128 and
masks the pad via segment ids:

- real tokens get segment id 1, pad tokens 0;
- the kernel masks where ``q_seg != kv_seg``, so real queries never see
  pad keys (exact numerics) and pad queries attend only to pad keys —
  every softmax row stays finite, so no NaN can leak into dk/dv through
  zero-cotangent pad rows;
- pad rows are sliced off the output.

Measured on v5e at ViT-L serving shapes [8, 16, 1568, 64]: padded-1664
full-block forward 4.13 ms vs 4.07 ms unpadded (scripts/
bench_finetune_flash.py, docs/PERFORMANCE.md) — padding is ~free, so
one code path serves both inference and training.

Replaces the torch ``scaled_dot_product_attention`` training path of the
reference's VideoMAE finetune/pretrain entries
(feature_extractors/VideoMAE/modeling_finetune.py:94-140,
run_mae_pretraining.py) — the reference never needed this because cuDNN
handles ragged lengths; on TPU the padding contract is ours to keep.
"""

from __future__ import annotations

import jax.numpy as jnp

_LANE = 128


def _bwd_minor(sp: int) -> int:
    """Largest legal backward tile at padded length ``sp``.

    The bwd kernels stack several [block, block] fp32 tensors in scoped
    VMEM (16 MB stack limit on v5e) — all-1664 blocks compile-OOM at
    17.44M, so above ~1k the minor tile must shrink. Legal minors are
    multiples of 128 that divide ``sp``; at sp=1664 (= 13 * 128) the
    only one under the limit is 128.
    """
    if sp <= 1024:
        return sp
    for mult in range(sp // 128, 0, -1):
        blk = 128 * mult
        if blk <= 1024 and sp % blk == 0:
            return blk
    return 128


def _full_block_sizes(s: int):
    """One S-sized block for every fwd/bwd tile of the public kernel.

    Forward-only legal at any ``s``; at S <= ~1024 the bwd tiles fit
    scoped VMEM too. The model path (``flash_mha``) uses
    ``_padded_block_sizes`` instead, which keeps the full-S forward
    schedule (measured fastest) but shrinks the bwd minors.
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    return fa.BlockSizes(
        block_q=s, block_k_major=s, block_k=s, block_b=1,
        block_q_major_dkv=s, block_k_major_dkv=s, block_k_dkv=s,
        block_q_dkv=s, block_k_major_dq=s, block_k_dq=s, block_q_dq=s)


def _padded_block_sizes(sp: int):
    """Full-``sp`` forward blocks + scoped-VMEM-legal backward tiles."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    m = _bwd_minor(sp)
    return fa.BlockSizes(
        block_q=sp, block_k_major=sp, block_k=sp, block_b=1,
        block_q_major_dkv=sp, block_k_major_dkv=sp, block_k_dkv=m,
        block_q_dkv=m, block_k_major_dq=sp, block_k_dq=m, block_q_dq=m)


def flash_mha(q, k, v, *, sm_scale: float):
    """Multi-head flash attention over ``[B, H, S, dh]`` tensors.

    Differentiable at any S: pads the sequence axis to the next multiple
    of 128 when needed (see module docstring). Exact softmax attention
    with fp32 online accumulators; output dtype follows ``q``.
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, _, s, _ = q.shape
    pad = (-s) % _LANE
    sp = s + pad
    segment_ids = None
    if pad:
        widths = ((0, 0), (0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, widths)
        k = jnp.pad(k, widths)
        v = jnp.pad(v, widths)
        ids = jnp.concatenate(
            [jnp.ones((b, s), jnp.int32), jnp.zeros((b, pad), jnp.int32)],
            axis=1)
        segment_ids = fa.SegmentIds(q=ids, kv=ids)
    out = fa.flash_attention(
        q, k, v, segment_ids=segment_ids, sm_scale=float(sm_scale),
        block_sizes=_padded_block_sizes(sp))
    return out[:, :, :s, :] if pad else out
