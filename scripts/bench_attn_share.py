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

    for tag, sdt in (("fp32 scores (parity)", jnp.float32),
                     ("bf16 scores (fast_scores)", jnp.bfloat16)):
        @jax.jit
        def chained(q, k, v, sdt=sdt):
            def body(_, carry):
                out = tim_attention(q + carry.astype(q.dtype), k, v,
                                    num_ctx, score_dtype=sdt)
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


if __name__ == "__main__":
    main()
