"""Fused int8 matmul + dequant epilogue as a Mosaic (Pallas) kernel.

VERDICT round-2 task 2: the XLA int8 path through the relay measured only
1.33x bf16 on big matmuls where the v5e MXU int8 rate is nominally 2x;
bf16 megafusion in Mosaic lost 19% to XLA (``ops/pallas_fused.py``), but
int8 changes the arithmetic-to-HBM ratio. This kernel runs, in one VMEM
pass per (row-block, col-block):

    x(bf16/fp32) -> quantize(static scale) -> int8 MXU dot (int32 acc)
      -> dequant (s_x * per-channel w_scale) [+ bias] [+ gelu] -> out

so the quantized activations, int32 accumulators, and fp32 epilogue never
round-trip HBM. The activation scale must be a compile-time constant
(static calibrated serving mode — the same requirement as the XLA path,
CLAUDE.md perf log).

Measured end-to-end wiring is opt-in (``ModelConfig`` keeps the XLA path
as the default); see docs/PERFORMANCE.md for numbers.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, s_ref, b_ref, o_ref, *, inv_sx: float,
            sx: float, activation: Optional[str], out_dtype):
    xq = jnp.clip(jnp.round(x_ref[:].astype(jnp.float32) * inv_sx),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * s_ref[:])
    if b_ref is not None:
        y = y + b_ref[:]
    if activation == "gelu":
        # exact (erf-form) GELU in fp32 — the repo-wide parity contract
        # (models.common.exact_gelu); tanh-approximate bf16 here would
        # silently diverge from int8_matmul_static + exact_gelu
        y = jax.nn.gelu(y, approximate=False)
    o_ref[:] = y.astype(out_dtype)


def int8_matmul_fused(
    x: jnp.ndarray,            # [..., K] fp32/bf16
    w_q: jnp.ndarray,          # [K, N] int8
    w_scale: jnp.ndarray,      # [N] fp32 per-out-channel
    act_scale: float,          # compile-time constant
    bias: Optional[jnp.ndarray] = None,   # [N] fp32
    activation: Optional[str] = None,     # None | 'gelu'
    *,
    block_m: int = 512,
    block_n: Optional[int] = None,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused static-scale int8 matmul; returns [..., N] in ``out_dtype``.

    Semantically identical (up to the epilogue dtype) to
    ``ops.quant.int8_matmul_static`` + bias + activation.
    """
    sx = float(max(act_scale, 1e-12))
    orig_shape = x.shape
    k = orig_shape[-1]
    n = w_q.shape[1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    bn = block_n or n
    bm = min(block_m, max(m, 8))

    kern = functools.partial(
        _kernel, inv_sx=1.0 / sx, sx=sx, activation=activation,
        out_dtype=jnp.dtype(out_dtype))
    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, bn), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bn,), lambda i, j: (j,), memory_space=pltpu.VMEM),
    ]
    args = [x2, w_q, w_scale.astype(jnp.float32)]
    if bias is not None:
        in_specs.append(pl.BlockSpec((bn,), lambda i, j: (j,),
                                     memory_space=pltpu.VMEM))
        args.append(bias.astype(jnp.float32))
        body = kern
    else:
        def body(x_ref, w_ref, s_ref, o_ref):
            kern(x_ref, w_ref, s_ref, None, o_ref)

    out = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.dtype(out_dtype)),
        grid=(pl.cdiv(m, bm), pl.cdiv(n, bn)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out.reshape(orig_shape[:-1] + (n,))


def supports_pallas_int8() -> bool:
    """True when the default backend compiles Mosaic TPU kernels — the
    same platform set as ``ops.pallas_attention.supports_pallas``
    ("axon" is the remote-relay TPU platform string). Logs when the
    opt-in kernel is unavailable so the XLA-static fallback is never
    silent."""
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    ok = platform in ("tpu", "axon")
    if not ok:
        import logging
        logging.getLogger(__name__).info(
            "quant_pallas_heads requested but platform %r has no Mosaic "
            "TPU support — using the XLA int8 static path", platform)
    return ok
