"""Measure (not estimate) the TIM attention core's share of the serving
step (VERDICT r3 task 3a).

The serving headline (int8-static + fast_scores, b128) runs ~1166 win/s
= ~110 ms/step; the int8 lever only accelerates matmuls with int8-able
operands, which excludes the attention einsums (activations x
activations). This times ``tim_attention`` alone at the exact serving
shapes — [128, 8, 898, 64], num_ctx=100, bf16 scores, x6 layers — so
the "int8 the attention einsums?" question gets a wall-clock answer.

Run: python scripts/bench_attn_share.py [--batch 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tim_tpu import config as C
    from tim_tpu.models.queries import generate_query_pyramid
    from tim_tpu.ops.attention import tim_attention

    print("devices:", jax.devices(), flush=True)
    cfg = C.epic_detection()
    nq = generate_query_pyramid(cfg.inference_query_size).shape[0]
    num_ctx = 2 * cfg.num_feats
    s = num_ctx + 2 * nq
    h = cfg.nhead
    dh = cfg.d_model // h
    b = args.batch
    print(f"shapes: B={b} H={h} S={s} Dh={dh} num_ctx={num_ctx} "
          f"layers={cfg.num_layers}", flush=True)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, s, dh)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, s, dh)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, s, dh)) * 0.1, jnp.bfloat16)

    # static-int8 variant of the structured chain: q/k/v quantized with
    # COMPILE-TIME scales (calibration-style), post-softmax weights
    # quantized at the known [0,1] range (scale 1/127 exactly). The
    # attention core is HBM-bound, not FLOP-bound (21 GFLOP but ~21 ms/
    # step) — int8 halves operand bytes, so it can win even without the
    # MXU int8 rate.
    s_q = float(np.abs(np.asarray(q, np.float32)).max() / 127.0)
    s_k = float(np.abs(np.asarray(k, np.float32)).max() / 127.0)
    s_v = float(np.abs(np.asarray(v, np.float32)).max() / 127.0)
    scale_sm = 1.0 / np.sqrt(dh)

    def quant(x, sc):
        return jnp.clip(jnp.round(x.astype(jnp.float32) / sc),
                        -127, 127).astype(jnp.int8)

    def int8_attention(q, k, v):
        qc, qq = q[:, :, :num_ctx], q[:, :, num_ctx:]
        kc, kq = k[:, :, :num_ctx], k[:, :, num_ctx:]
        vc, vq = v[:, :, :num_ctx], v[:, :, num_ctx:]
        qc8, qq8 = quant(qc, s_q), quant(qq, s_q)
        kc8 = quant(kc, s_k)
        vc8 = quant(vc, s_v)
        dn_qk = (((3,), (3,)), ((0, 1), (0, 1)))
        dn_pv = (((3,), (2,)), ((0, 1), (0, 1)))
        deq_qk = jnp.float32(s_q * s_k * scale_sm)

        ctx_scores = jax.lax.dot_general(
            qc8, kc8, dn_qk, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * deq_qk
        ctx_w = jax.nn.softmax(ctx_scores, axis=-1)
        ctx_w8 = quant(ctx_w, 1.0 / 127.0)
        ctx_out = (jax.lax.dot_general(
            ctx_w8, vc8, dn_pv, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * jnp.float32(s_v / 127.0)
        ).astype(q.dtype)

        qry_scores = jax.lax.dot_general(
            qq8, kc8, dn_qk, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * deq_qk
        self_scores = jnp.sum(
            qq.astype(jnp.float32) * kq.astype(jnp.float32), axis=-1,
            keepdims=True) * scale_sm
        m = jnp.maximum(jnp.max(qry_scores, axis=-1, keepdims=True),
                        self_scores)
        e_ctx = jnp.exp(qry_scores - m)
        e_self = jnp.exp(self_scores - m)
        denom = jnp.sum(e_ctx, axis=-1, keepdims=True) + e_self
        w_ctx8 = quant(e_ctx / denom, 1.0 / 127.0)
        w_self = (e_self / denom).astype(q.dtype)
        qry_out = (jax.lax.dot_general(
            w_ctx8, vc8, dn_pv, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * jnp.float32(s_v / 127.0)
        ).astype(q.dtype)
        qry_out = qry_out + w_self * vq
        return jnp.concatenate([ctx_out, qry_out], axis=2)

    variants = [
        ("fp32 scores (parity)",
         lambda q, k, v: tim_attention(q, k, v, num_ctx,
                                       score_dtype=jnp.float32)),
        ("bf16 scores (fast_scores)",
         lambda q, k, v: tim_attention(q, k, v, num_ctx,
                                       score_dtype=jnp.bfloat16)),
        ("static-int8 einsums", int8_attention),
    ]
    for tag, fn in variants:
        @jax.jit
        def chained(q, k, v, fn=fn):
            def body(_, carry):
                out = fn(q + carry.astype(q.dtype), k, v)
                return jnp.max(out).astype(jnp.float32) * jnp.float32(1e-9)
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

        float(chained(q, k, v))
        t0 = time.perf_counter()
        float(chained(q, k, v))
        dt = (time.perf_counter() - t0) / args.iters
        step_ms = dt * cfg.num_layers * 1e3
        # headline step time at this batch from the bench (1166 win/s)
        full_step_ms = b / 1166.0 * 1e3
        print(f"[attn-share] {tag}: {dt * 1e3:.3f} ms/layer -> "
              f"{step_ms:.2f} ms for {cfg.num_layers} layers = "
              f"{step_ms / full_step_ms * 100:.1f}% of the "
              f"{full_step_ms:.1f} ms headline step", flush=True)

    # numeric sanity of the int8 chain vs fp32 (same inputs)
    ref = np.asarray(jax.jit(lambda q, k, v: tim_attention(
        q, k, v, num_ctx, score_dtype=jnp.float32))(q, k, v), np.float32)
    got = np.asarray(jax.jit(int8_attention)(q, k, v), np.float32)
    denom = np.abs(ref).max()
    print(f"[attn-share] int8 vs fp32 max |d|: "
          f"{np.abs(ref - got).max():.4f} (out scale {denom:.3f})",
          flush=True)


if __name__ == "__main__":
    main()
