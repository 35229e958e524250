"""Attribute the fused post-attention kernel's loss vs XLA.

Times, at bench shapes (n=114944 rows, c=1024, ff=2048, bf16):
  1. XLA unfused chain (residual+LN1+FFN+residual+LN2)  — the baseline
  2. XLA matmul-only (the two FFN matmuls, no LN/gelu)  — MXU ceiling
  3. Pallas matmul-only kernel (same grid/blocks)       — Mosaic MXU cost
  4. Pallas full fused kernel                           — Mosaic MXU+VPU

(4)-(3) = VPU/elementwise cost inside the kernel (serialized with MXU);
(3)-(2) = Mosaic vs XLA matmul efficiency gap.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tim_tpu.ops.pallas_fused import fused_post_attention

    n, c, ff = 114944, 1024, 2048
    blk = 512
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, c)) * 0.1, jnp.bfloat16)
    a = jnp.asarray(rng.normal(size=(n, c)) * 0.1, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(c, ff)) * 0.02, jnp.float32)
    b1 = jnp.zeros((ff,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(ff, c)) * 0.02, jnp.float32)
    b2 = jnp.zeros((c,), jnp.float32)
    ones = jnp.ones((c,), jnp.float32)
    zeros = jnp.zeros((c,), jnp.float32)

    iters = 20

    def timeit(tag, fn, *args):
        @jax.jit
        def chained(*args):
            def body(_, carry):
                out = fn(args[0] + carry, *args[1:])
                return jnp.max(out).astype(jnp.float32) * jnp.float32(1e-9)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        float(chained(*args))
        t0 = time.perf_counter()
        float(chained(*args))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"[micro] {tag}: {dt:.3f} ms/call", flush=True)
        return dt

    # 1. XLA unfused chain
    def xla_chain(x, a, w1, b1, w2, b2):
        import flax.linen as nn
        def ln(v):
            mu = jnp.mean(v.astype(jnp.float32), -1, keepdims=True)
            var = jnp.maximum(jnp.mean(
                v.astype(jnp.float32) ** 2, -1, keepdims=True) - mu * mu, 0)
            return ((v.astype(jnp.float32) - mu)
                    * jax.lax.rsqrt(var + 1e-5)).astype(jnp.bfloat16)
        y = ln(x + a)
        h = jnp.dot(y, w1.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + b1
        h = jax.nn.gelu(h.astype(jnp.bfloat16), approximate=True)
        o = jnp.dot(h, w2.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + b2
        return ln(y + o.astype(jnp.bfloat16))

    t_xla = timeit("XLA unfused chain", xla_chain, x, a, w1, b1, w2, b2)

    # 2. XLA matmul-only
    def xla_mm(x, w1, w2):
        h = jnp.dot(x, w1.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return jnp.dot(h, w2.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32).astype(
                           jnp.bfloat16)

    t_xmm = timeit("XLA matmul-only", xla_mm, x, w1, w2)

    # 3. Pallas matmul-only (same grid/blocks as the fused kernel)
    def mm_kernel(x_ref, w1_ref, w2_ref, o_ref):
        h = jnp.dot(x_ref[:], w1_ref[:],
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        o_ref[:] = jnp.dot(h, w2_ref[:],
                           preferred_element_type=jnp.float32).astype(
                               jnp.bfloat16)

    @jax.jit
    def pallas_mm(x, w1, w2):
        return pl.pallas_call(
            mm_kernel,
            out_shape=jax.ShapeDtypeStruct((n, c), jnp.bfloat16),
            grid=(pl.cdiv(n, blk),),
            in_specs=[
                pl.BlockSpec((blk, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, ff), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ff, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(x, w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16))

    t_pmm = timeit("Pallas matmul-only", pallas_mm, x, w1, w2)

    # 4. Pallas full fused kernel
    def full(x, a, w1, b1, w2, b2):
        return fused_post_attention(
            x.reshape(1, n, c), a.reshape(1, n, c), ones, zeros,
            w1, b1, w2, b2, ones, zeros, block_rows=blk).reshape(n, c)

    t_pf = timeit("Pallas fused full", full, x, a, w1, b1, w2, b2)

    flops = 4 * n * c * ff
    print(f"[micro] FFN flops/call: {flops/1e9:.1f} GFLOP")
    for tag, t in [("XLA chain", t_xla), ("XLA mm", t_xmm),
                   ("Pallas mm", t_pmm), ("Pallas fused", t_pf)]:
        print(f"[micro] {tag}: {flops / (t / 1e3) / 1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
