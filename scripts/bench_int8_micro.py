"""Micro-attribution for the Mosaic int8 fused matmul+epilogue question.

CLAUDE.md round-3 candidate #2 / VERDICT round-2 task 2: XLA int8 through
the relay measured only 1.33x bf16 on big matmuls where the v5e MXU int8
rate is nominally 2x. bf16 megafusion in Mosaic lost 19% to XLA; int8
changes the arithmetic-to-HBM ratio, so measure whether a Pallas kernel
that fuses quantize -> int8 MXU matmul -> dequant epilogue (+bias+gelu)
beats the XLA static-scale int8 path at serving shapes.

Shapes: the bench headline FFN (n=114944 rows = 898 tokens x 128 windows,
1024 -> 2048 -> 1024) and the detection head (1024 -> 3806).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import time

import numpy as np


def timeit(tag, fn, *args, iters=20):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*args):
        def body(_, carry):
            out = fn(args[0] + carry, *args[1:])
            return jnp.max(out).astype(jnp.float32) * jnp.float32(1e-9)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(chained(*args))          # compile
    t0 = time.perf_counter()
    float(chained(*args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"[micro] {tag}: {dt:.3f} ms/call", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("devices:", jax.devices(), flush=True)

    n, c, ff = 114944, 1024, 2048
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, c)) * 0.1, jnp.bfloat16)
    w1 = np.asarray(rng.normal(size=(c, ff)) * 0.02, np.float32)
    w2 = np.asarray(rng.normal(size=(ff, c)) * 0.02, np.float32)

    def q(w):
        s = np.maximum(np.max(np.abs(w), 0) / 127.0, 1e-12)
        return (jnp.asarray(np.clip(np.round(w / s), -127, 127), jnp.int8),
                jnp.asarray(s, jnp.float32))

    w1_q, s1 = q(w1)
    w2_q, s2 = q(w2)
    sx = 0.05  # static act scale (compile-time const)
    gf = 2 * n * c * ff * 2 / 1e9  # two matmuls

    # ---- 1. XLA bf16 (the non-quantized floor) ----
    def bf16_ffn(x):
        h = jnp.dot(x, jnp.asarray(w1, jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h.astype(jnp.bfloat16), approximate=True)
        return jnp.dot(h, jnp.asarray(w2, jnp.bfloat16),
                       preferred_element_type=jnp.float32).astype(
                           jnp.bfloat16)
    t = timeit("XLA bf16 ffn", bf16_ffn, x)
    print(f"         = {gf / t * 1e3:.1f} GF/s eq", flush=True)

    # ---- 2. XLA int8 static-scale (current Int8Dense path) ----
    def xla_int8(x):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        h = jax.lax.dot_general(
            xq, w1_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        h = h.astype(jnp.float32) * (sx * s1)
        h = jax.nn.gelu(h.astype(jnp.bfloat16), approximate=True)
        hq = jnp.clip(jnp.round(h.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        o = jax.lax.dot_general(
            hq, w2_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (o.astype(jnp.float32) * (sx * s2)).astype(jnp.bfloat16)
    t = timeit("XLA int8 static ffn", xla_int8, x)
    print(f"         = {gf / t * 1e3:.1f} GF/s eq", flush=True)

    # ---- 3. XLA int8 matmul only (pre-quantized int8 activations) ----
    xq_pre = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)

    def xla_int8_mm(xq):
        h = jax.lax.dot_general(
            xq, w1_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.int8)
        return jax.lax.dot_general(
            h, w2_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    t = timeit("XLA int8 matmul-only", xla_int8_mm, xq_pre)
    print(f"         = {gf / t * 1e3:.1f} GF/s eq", flush=True)

    # ---- 4. Pallas fused int8 (quantize+mm+dequant+gelu+quantize+mm) ----
    for blk in (256, 512, 1024):
        def k_fused(x_ref, w1_ref, s1_ref, w2_ref, s2_ref, o_ref):
            xq = jnp.clip(jnp.round(x_ref[:].astype(jnp.float32)
                                    * (1.0 / sx)), -127, 127
                          ).astype(jnp.int8)
            h = jax.lax.dot_general(
                xq, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            h = h.astype(jnp.float32) * (sx * s1_ref[:])
            h = jax.nn.gelu(h.astype(jnp.bfloat16), approximate=True)
            hq = jnp.clip(jnp.round(h.astype(jnp.float32) * (1.0 / sx)),
                          -127, 127).astype(jnp.int8)
            o = jax.lax.dot_general(
                hq, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o_ref[:] = (o.astype(jnp.float32)
                        * (sx * s2_ref[:])).astype(jnp.bfloat16)

        @jax.jit
        def pallas_fused(x):
            return pl.pallas_call(
                k_fused,
                out_shape=jax.ShapeDtypeStruct((n, c), jnp.bfloat16),
                grid=(pl.cdiv(n, blk),),
                in_specs=[
                    pl.BlockSpec((blk, c), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((c, ff), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((ff,), lambda i: (0,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((ff, c), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((c,), lambda i: (0,),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((blk, c), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(x, w1_q, s1, w2_q, s2)
        try:
            t = timeit(f"Pallas int8 fused ffn blk={blk}", pallas_fused, x)
            print(f"         = {gf / t * 1e3:.1f} GF/s eq", flush=True)
        except Exception as e:
            print(f"[micro] Pallas int8 fused blk={blk} FAILED: "
                  f"{type(e).__name__}: {e}", flush=True)

    # ---- 5. head matmul 1024 -> 3806 ----
    ch = 3806
    wh = np.asarray(rng.normal(size=(c, ch)) * 0.02, np.float32)
    wh_q, sh = q(wh)
    nh = 51072  # 399 queries x 128 windows
    xh = jnp.asarray(rng.normal(size=(nh, c)) * 0.1, jnp.bfloat16)
    gfh = 2 * nh * c * ch / 1e9

    def xla_head(x):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        o = jax.lax.dot_general(
            xq, wh_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (o.astype(jnp.float32) * (sx * sh)).astype(jnp.bfloat16)
    t = timeit("XLA int8 static head", xla_head, xh)
    print(f"         = {gfh / t * 1e3:.1f} GF/s eq", flush=True)

    for blk, nblk in ((256, 1903), (512, 1903), (256, 3806)):
        def k_head(x_ref, w_ref, s_ref, o_ref):
            xq = jnp.clip(jnp.round(x_ref[:].astype(jnp.float32)
                                    * (1.0 / sx)), -127, 127
                          ).astype(jnp.int8)
            o = jax.lax.dot_general(
                xq, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o_ref[:] = (o.astype(jnp.float32)
                        * (sx * s_ref[:])).astype(jnp.bfloat16)

        @jax.jit
        def pallas_head(x):
            return pl.pallas_call(
                k_head,
                out_shape=jax.ShapeDtypeStruct((nh, ch), jnp.bfloat16),
                grid=(pl.cdiv(nh, blk), pl.cdiv(ch, nblk)),
                in_specs=[
                    pl.BlockSpec((blk, c), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((c, nblk), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nblk,), lambda i, j: (j,),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((blk, nblk), lambda i, j: (i, j),
                                       memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(x, wh_q, sh)
        try:
            t = timeit(f"Pallas int8 head blk={blk}x{nblk}", pallas_head,
                       xh)
            print(f"         = {gfh / t * 1e3:.1f} GF/s eq", flush=True)
        except Exception as e:
            print(f"[micro] Pallas int8 head blk={blk}x{nblk} FAILED: "
                  f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
