"""Attribute the int8-static backbone slowdown (round 4).

End-to-end, the int8-static ViT-L path measured 162.9 ms/clip vs 14.7
bf16-flash (11x SLOWER) and Swin-B 61.1 vs 26.1 (2.3x slower) — the
opposite sign of the TIM serving result (+1.37x on the same Int8Dense
machinery). This micro isolates where the regression lives:

  1. bare matmuls at ViT-L shapes: bf16 dot vs the fused int8-static
     quantize chain (the thing that wins 1.37x at TIM serving shapes);
  2. one ViT-L block, quantized vs bf16, flash on/off (does the
     pallas_call boundary break the quantize/epilogue fusion?);
  3. full-depth ViT-L, flash off, quantized vs bf16 (is it the
     int8 <-> flash interaction or int8 itself?).

Run: python scripts/bench_int8_backbone_micro.py [--part mm|block|model|all]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def chained_time(fn, *args, iters=10, tag=""):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        def body(_, carry):
            out = fn(a[0] + carry.astype(a[0].dtype), *a[1:])
            return jnp.max(out).astype(jnp.float32) * jnp.float32(1e-9)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(chained(*args))
    t0 = time.perf_counter()
    float(chained(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"[int8-attr] {tag}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def bench_mm():
    """Bare matmuls at ViT-L shapes. M = 8 clips x 1568 tokens."""
    import jax.numpy as jnp

    from tim_tpu.ops.quant import (int8_matmul_static, quantize_kernel)

    rng = np.random.default_rng(0)
    m = 8 * 1568
    for k, n, tag in ((1024, 3072, "qkv"), (1024, 4096, "fc1"),
                      (4096, 1024, "fc2")):
        x = jnp.asarray(rng.normal(size=(m, k)) * 0.1, jnp.bfloat16)
        w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
        w_q, w_s = quantize_kernel(w)
        w_q, w_s = jnp.asarray(w_q), jnp.asarray(w_s)
        wb = jnp.asarray(w, jnp.bfloat16)
        act_scale = 0.5 / 127.0

        chained_time(lambda x, wb=wb: jnp.dot(
            x, wb, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
            x, tag=f"{tag} [{m}x{k}x{n}] bf16")
        chained_time(lambda x, a=w_q, b=w_s: int8_matmul_static(
            x, a, b, act_scale).astype(jnp.bfloat16),
            x, tag=f"{tag} [{m}x{k}x{n}] int8-static (const scale)")
        # 3-D activations, as the backbone actually feeds them
        x3 = x.reshape(8, 1568, k)
        chained_time(lambda x, a=w_q, b=w_s: int8_matmul_static(
            x, a, b, act_scale).astype(jnp.bfloat16),
            x3, tag=f"{tag} [8x1568x{k}x{n}] int8-static 3-D")


def bench_trace():
    """Isolate WHY the int8 block is ~5x slower while the bare
    closure-const matmul wins: traced vs constant int8 weights, and the
    LN->quantize->matmul->gelu chain."""
    import jax
    import jax.numpy as jnp

    from tim_tpu.ops.quant import int8_matmul_static, quantize_kernel

    rng = np.random.default_rng(0)
    m, k, n = 8 * 1568, 1024, 4096
    x = jnp.asarray(rng.normal(size=(m, k)) * 0.1, jnp.bfloat16)
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
    w_q_h, w_s_h = quantize_kernel(w)
    w_q, w_s = jnp.asarray(w_q_h), jnp.asarray(w_s_h)
    w2 = rng.normal(size=(n, k)).astype(np.float32) * 0.02
    w2_q_h, w2_s_h = quantize_kernel(w2)
    w2_q, w2_s = jnp.asarray(w2_q_h), jnp.asarray(w2_s_h)
    act_scale = 0.5 / 127.0

    # A. closure-const weights (the winning micro config)
    chained_time(lambda x: int8_matmul_static(
        x, w_q, w_s, act_scale).astype(jnp.bfloat16),
        x, tag="const int8 weights")

    # B. traced weights (how model params arrive)
    chained_time(lambda x, a, b: int8_matmul_static(
        x, a, b, act_scale).astype(jnp.bfloat16),
        x, w_q, w_s, tag="traced int8 weights")

    # C. traced + fp32 LN in front (the ViTBlock context)
    def ln(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return (xf - mu) * jax.lax.rsqrt(var + 1e-6)

    chained_time(lambda x, a, b: int8_matmul_static(
        ln(x).astype(jnp.bfloat16), a, b, act_scale).astype(jnp.bfloat16),
        x, w_q, w_s, tag="LN(fp32) -> traced int8")

    # D. the FFN pair with gelu between (residual chain), traced
    from tim_tpu.models.common import exact_gelu

    def ffn(x, a, b, c, d):
        h = int8_matmul_static(ln(x).astype(jnp.bfloat16), a, b,
                               act_scale).astype(jnp.bfloat16)
        h = exact_gelu(h)
        h = int8_matmul_static(h, c, d, act_scale).astype(jnp.bfloat16)
        return x + h

    chained_time(ffn, x, w_q, w_s, w2_q, w2_s, tag="traced int8 FFN pair")

    def ffn_bf16(x, wb, w2b):
        h = jnp.dot(ln(x).astype(jnp.bfloat16), wb,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        h = exact_gelu(h)
        h = jnp.dot(h, w2b,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return x + h

    chained_time(ffn_bf16, x, jnp.asarray(w, jnp.bfloat16),
                 jnp.asarray(w2, jnp.bfloat16), tag="bf16 FFN pair")


def bench_attnmod():
    """One VideoMAEAttention module (and its two Int8Dense halves),
    quantized vs bf16, flash off — the FFN pair measured fine, so the
    5.4x block regression must be here."""
    import jax
    import jax.numpy as jnp

    from tim_tpu.models.backbones.vit import VideoMAEAttention
    from tim_tpu.ops import quant

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.normal(size=(8, 1568, 1024)) * 0.1, jnp.bfloat16)

    fp = VideoMAEAttention(1024, 16, dtype=jnp.bfloat16)
    params = fp.init(key, x)["params"]
    chained_time(lambda x, p: fp.apply({"params": p}, x), x, params,
                 tag="attn module bf16")

    qp = quant.quantize_backbone_params(params)
    qdyn = VideoMAEAttention(1024, 16, dtype=jnp.bfloat16, quantized=True)
    cal = quant.calibrate_act_scales(
        lambda vs, b, m: qdyn.apply(vs, b, mutable=m), {"params": qp}, [x])
    scales = quant.act_scales_tuple(cal)
    print(f"[int8-attr] attn module scales: {scales}", flush=True)

    def strip(node):
        if not isinstance(node, dict):
            return node
        return {k: strip(v) for k, v in node.items() if k != "act_scale"}

    qmod = VideoMAEAttention(1024, 16, dtype=jnp.bfloat16, quantized=True,
                             act_scales=scales)
    sparams = strip(cal)
    chained_time(lambda x, p: qmod.apply({"params": p}, x), x, sparams,
                 tag="attn module int8-static")

    # dynamic-quant variant (no static scales) for contrast
    chained_time(lambda x, p: qdyn.apply({"params": p}, x), x, qp,
                 tag="attn module int8-dynamic")


def bench_block_and_model(part):
    """ViT-L quantized vs bf16 at block and full-model level."""
    import jax
    import jax.numpy as jnp

    from tim_tpu.models.backbones.vit import VideoMAEViT
    from tim_tpu.ops import quant

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    depth = 2 if part == "block" else 24
    clip = jnp.asarray(rng.normal(size=(8, 16, 224, 224, 3)) * 0.1,
                       jnp.bfloat16)

    def strip(node):
        if not isinstance(node, dict):
            return node
        return {k: strip(v) for k, v in node.items() if k != "act_scale"}

    for use_flash in (False, True):
        fp = VideoMAEViT(depth=depth, dtype=jnp.bfloat16,
                         use_flash=use_flash)
        params = fp.init(key, clip[:1])["params"]
        t_fp = chained_time(
            lambda c, p: fp.apply({"params": p}, c), clip, params,
            tag=f"vit d{depth} bf16 flash={use_flash}")

        qp = quant.quantize_backbone_params(params)
        qdyn = VideoMAEViT(depth=depth, dtype=jnp.bfloat16,
                           use_flash=use_flash, quantized=True)
        cal = quant.calibrate_act_scales(
            lambda vs, b, m: qdyn.apply(vs, b, mutable=m),
            {"params": qp}, [clip[:2]])
        scales = quant.act_scales_tuple(cal)
        qmodel = VideoMAEViT(depth=depth, dtype=jnp.bfloat16,
                             use_flash=use_flash, quantized=True,
                             act_scales=scales)
        sparams = strip(cal)
        t_q = chained_time(
            lambda c, p: qmodel.apply({"params": p}, c), clip, sparams,
            tag=f"vit d{depth} int8-static flash={use_flash}")
        print(f"[int8-attr] vit d{depth} flash={use_flash}: int8/bf16 = "
              f"{t_q / t_fp:.2f}x", flush=True)
        # dynamic per-row act scales (no static consts): the attn-module
        # micro showed dynamic ~= bf16, static-const 2.5x slower
        t_d = chained_time(
            lambda c, p: qdyn.apply({"params": p}, c), clip, qp,
            tag=f"vit d{depth} int8-dynamic flash={use_flash}")
        print(f"[int8-attr] vit d{depth} flash={use_flash}: "
              f"dyn-int8/bf16 = {t_d / t_fp:.2f}x", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="all",
                    choices=["mm", "trace", "attnmod", "block", "model",
                             "all"])
    args = ap.parse_args()
    import jax
    print("devices:", jax.devices(), flush=True)
    if args.part in ("mm", "all"):
        bench_mm()
    if args.part in ("trace", "all"):
        bench_trace()
    if args.part in ("attnmod", "all"):
        bench_attnmod()
    if args.part in ("block", "all"):
        bench_block_and_model("block")
    if args.part in ("model", "all"):
        bench_block_and_model("model")


if __name__ == "__main__":
    main()
