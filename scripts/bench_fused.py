"""TPU A/B: unfused vs fused-Pallas post-attention block at bench shapes.

Same chained-iteration methodology as bench.py (per CLAUDE.md: one jit,
data-dependent chain, single scalar fetch). Run on the real chip:

    python scripts/bench_fused.py [block_rows ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import dataclasses
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tim_tpu import config as C
    from tim_tpu.models import TimDetection
    from tim_tpu.models.queries import generate_query_pyramid
    from tim_tpu.train.detection import make_inference_step

    batch = 128
    iters = 30

    base = C.epic_detection(compute_dtype="bfloat16")
    nq = generate_query_pyramid(base.inference_query_size).shape[0]
    nf = base.num_feats
    rng = np.random.default_rng(0)
    example = {
        "v_feats": jnp.asarray(rng.normal(
            size=(batch, nf, base.visual_input_dim)), jnp.float32),
        "a_feats": jnp.asarray(rng.normal(
            size=(batch, nf, base.audio_input_dim)), jnp.float32),
        "times": jnp.asarray(rng.uniform(size=(batch, 2 * nf, 2)),
                             jnp.float32),
        "window_start": jnp.zeros((batch,), jnp.float32),
        "window_size": jnp.full((batch,), 30.0, jnp.float32),
    }

    key = jax.random.PRNGKey(0)
    t_dummy = jnp.zeros((batch, 2 * nf + 2 * nq, 2))
    model = TimDetection(base)
    variables = model.init({"params": key, "dropout": key},
                           example["v_feats"], example["a_feats"],
                           t_dummy, nq, nq, deterministic=True)
    params = variables["params"]

    def measure(cfg, tag):
        infer = make_inference_step(TimDetection(cfg), cfg)

        @jax.jit
        def chained(p, ex):
            def body(_, carry):
                pe = dict(ex)
                pe["v_feats"] = ex["v_feats"] + carry
                out = infer(p, pe)
                return jnp.max(out["v_scores"]).astype(
                    jnp.float32) * jnp.float32(1e-6)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        float(chained(params, example))  # compile + warm
        t0 = time.perf_counter()
        float(chained(params, example))
        dt = time.perf_counter() - t0
        wps = batch * iters / dt
        print(f"[bench_fused] {tag}: {wps:.1f} windows/s ({dt:.3f}s)",
              flush=True)
        return wps

    base_wps = measure(base, "unfused bf16")
    for blk in [int(a) for a in sys.argv[1:]] or [512]:
        import functools

        import tim_tpu.models.transformer as tr
        import tim_tpu.ops.pallas_fused as pf
        # rebind the call-site default for THIS block size only, and
        # restore afterwards (a stale patch would silently mislabel the
        # next block's measurement)
        fcfg = dataclasses.replace(base, use_fused_ffn=True)
        orig = tr.fused_post_attention
        tr.fused_post_attention = functools.partial(
            pf.fused_post_attention, block_rows=blk)
        try:
            wps = measure(fcfg, f"fused blk={blk}")
        finally:
            tr.fused_post_attention = orig
        print(f"[bench_fused] fused/unfused = {wps / base_wps:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
