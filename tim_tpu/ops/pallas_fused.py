"""Pallas TPU kernel: fused post-attention encoder block.

After self-attention, a TIM encoder layer does (post-norm, deterministic
path of ``recognition/.../models/helpers/transformers.py:92-111``):

    y = LN1(x + attn)
    z = LN2(y + W2 @ gelu(W1 @ y))

At EPIC detection serving shapes the [B, S, 1024] token tensor is ~235 MB
(bf16, batch 128); the unfused XLA graph round-trips it through HBM for the
residual add, both (fp32) LayerNorms, the GELU, and the second residual —
the measured bf16 path sits at ~59% of the chip's matmul ceiling with the
gap almost entirely in these elementwise/HBM passes (CLAUDE.md perf log).

This kernel streams row-blocks of tokens through VMEM and performs the
whole post-attention stack — residual, LN1 (fp32 stats, flax fast-variance
semantics), FFN matmuls on the MXU with fp32 accumulation, exact GELU,
residual, LN2 — in one pass. HBM traffic per layer drops to: read x, read
attn, write z, plus the (resident) FFN weights.

Numerics match the unfused flax stack: adds in the compute dtype, LN in
fp32 with epsilon 1e-5, matmul accumulation fp32, bias add fp32, GELU
(erf form) in the compute dtype. Exactness is pinned by tests (interpret
mode on CPU, compiled on TPU).

MEASURED RESULT (v5e, bench shapes, scripts/bench_fused{,_micro}.py):
the kernel LOSES to XLA end-to-end — 851 vs 965 windows/s (0.88x),
stable across block_rows 256..2048. Attribution:
  XLA matmul-only        141.4 TFLOP/s   (near the ~160 ceiling)
  XLA full unfused chain 119.7 TFLOP/s   (85% fusion efficiency!)
  Pallas matmul-only     115.0 TFLOP/s   (Mosaic block matmul -19% vs XLA)
  Pallas fused full      101.9 TFLOP/s   (VPU LN/GELU serialize with MXU)
XLA already folds the residual/LN/GELU passes into its matmul pipeline so
well that perfect fusion could recover at most 8.05/6.82 = 1.18x on the
FFN segment (~8% end-to-end); Mosaic's generic per-block matmul gives up
more than that, and its VPU stages don't overlap the MXU across grid
steps. Kept opt-in (``use_fused_ffn``) as the starting point if shapes
change (e.g. much wider FFN); the perf lever on this chip is int8 serving
(``ops/quant.py``), not bf16 fusion.

The backward pass is not defined — the fused path is used only on
deterministic (inference/validation) steps; training keeps the unfused
stack whose backward XLA already fuses well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_INV_SQRT2 = 0.7071067811865476


def _erf(x32):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs error 1.5e-7 —
    below bf16 resolution and our fp32 parity tolerance). Mosaic lowers
    neither ``erf`` nor ``erfc``, so the exact-GELU path needs a
    polynomial built from supported primitives."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    sign = jnp.sign(x32)
    ax = jnp.abs(x32)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _erf_gelu(x):
    """Exact (erf-form) GELU: matches ``jax.nn.gelu(approximate=False)``
    to ~1e-7 in fp32; sub-ulp in bf16."""
    x32 = x.astype(jnp.float32)
    y = 0.5 * x32 * (1.0 + _erf(x32 * _INV_SQRT2))
    return y.astype(x.dtype)


def _layernorm_fp32(x32, scale_ref, bias_ref, eps):
    """flax ``nn.LayerNorm`` fast-variance semantics, fp32 in/out."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return y * scale_ref[:] + bias_ref[:]


def _fused_kernel(x_ref, a_ref, ln1s_ref, ln1b_ref, w1_ref, b1_ref,
                  w2_ref, b2_ref, ln2s_ref, ln2b_ref, o_ref, *, eps: float):
    dt = x_ref.dtype
    s = x_ref[:] + a_ref[:]                               # residual, dt
    y32 = _layernorm_fp32(s.astype(jnp.float32), ln1s_ref, ln1b_ref, eps)
    y = y32.astype(dt)

    h = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
    h = _erf_gelu((h + b1_ref[:]).astype(dt))
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    o = (o + b2_ref[:]).astype(dt)

    z32 = _layernorm_fp32((y + o).astype(jnp.float32), ln2s_ref, ln2b_ref,
                          eps)
    o_ref[:] = z32.astype(dt)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def fused_post_attention(
    x: jnp.ndarray,        # [B, S, C] residual stream (pre-attention)
    attn: jnp.ndarray,     # [B, S, C] attention output (post out-proj)
    ln1_scale: jnp.ndarray, ln1_bias: jnp.ndarray,       # [C] fp32
    w1: jnp.ndarray, b1: jnp.ndarray,                    # [C, FF], [FF]
    w2: jnp.ndarray, b2: jnp.ndarray,                    # [FF, C], [C]
    ln2_scale: jnp.ndarray, ln2_bias: jnp.ndarray,       # [C] fp32
    *,
    block_rows: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """LN2(y + FFN(y)) where y = LN1(x + attn), fused over token blocks."""
    b, s, c = x.shape
    ff = w1.shape[1]
    n = b * s
    dt = x.dtype

    grid = (pl.cdiv(n, block_rows),)
    row_spec = pl.BlockSpec((block_rows, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_fused_kernel, eps=1e-5),
        out_shape=jax.ShapeDtypeStruct((n, c), dt),
        grid=grid,
        in_specs=[
            row_spec, row_spec,
            const((1, c)), const((1, c)),        # ln1 scale/bias
            const((c, ff)), const((1, ff)),      # w1/b1
            const((ff, c)), const((1, c)),       # w2/b2
            const((1, c)), const((1, c)),        # ln2 scale/bias
        ],
        out_specs=row_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * c * ff,
            bytes_accessed=3 * n * c * x.dtype.itemsize + 4 * c * ff,
            transcendentals=n * ff,
        ),
        # v5e carries 128 MB VMEM; the default 16 MB scoped limit rejects
        # the resident FFN weights (8 MB bf16) + double-buffered blocks.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(
        x.reshape(n, c), attn.reshape(n, c),
        ln1_scale.reshape(1, c).astype(jnp.float32),
        ln1_bias.reshape(1, c).astype(jnp.float32),
        w1.astype(dt), b1.reshape(1, ff).astype(jnp.float32),
        w2.astype(dt), b2.reshape(1, c).astype(jnp.float32),
        ln2_scale.reshape(1, c).astype(jnp.float32),
        ln2_bias.reshape(1, c).astype(jnp.float32),
    )
    return out.reshape(b, s, c)


def fused_supported() -> bool:
    """True when the default backend compiles Pallas TPU kernels."""
    from tim_tpu.ops.pallas_attention import supports_pallas
    return supports_pallas()
