"""XLA compiler_options sweep on the top-level serving jit (VERDICT
round-2 task 7).

Mechanism note (CLAUDE.md): compiler_options DO reach the remote
compiler when passed on the TOP-LEVEL jit; XLA_FLAGS TPU flags are
rejected locally. Round-2 swept only scoped vmem (64/96MB, both losses);
this sweeps the latency-hiding scheduler and other documented TPU
toggles on the bf16 parity path and the int8-static headline. Unknown
options are reported as rejected rather than crashing the sweep.

Run:  python scripts/bench_xla_options.py [bf16|int8] [batch]
"""

import dataclasses
import sys
import time

import numpy as np


SWEEP = [
    ("baseline", {}),
    ("lhs_off", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    ("lhs_on", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_128m", {"xla_tpu_scoped_vmem_limit_kib": "131072"}),
    ("no_min_max_prop",
     {"xla_tpu_enable_aggressive_instruction_fusion": "true"}),
    ("async_done_fold", {"xla_tpu_enable_async_collective_fusion": "true"}),
    ("licm_off", {"xla_tpu_licm_size_inflation_ratio": "1"}),
    ("flash_attn", {"xla_tpu_enable_flash_attention": "true"}),
    ("retile", {"xla_tpu_enable_experimental_fusion_cost_model": "true"}),
]


def main():
    import jax
    import jax.numpy as jnp

    from tim_tpu import config as C
    from tim_tpu.models import TimDetection
    from tim_tpu.models.queries import generate_query_pyramid
    from tim_tpu.ops import quant
    from tim_tpu.train.detection import make_inference_step

    mode = sys.argv[1] if len(sys.argv) > 1 else "int8"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    iters = 30

    cfg = C.epic_detection(compute_dtype="bfloat16")
    model = TimDetection(cfg)
    nq = generate_query_pyramid(cfg.inference_query_size).shape[0]
    nf = cfg.num_feats
    rng = np.random.default_rng(0)
    example = {
        "v_feats": jnp.asarray(rng.normal(
            size=(batch, nf, cfg.visual_input_dim)), jnp.float32),
        "a_feats": jnp.asarray(rng.normal(
            size=(batch, nf, cfg.audio_input_dim)), jnp.float32),
        "times": jnp.asarray(rng.uniform(size=(batch, 2 * nf, 2)),
                             jnp.float32),
        "window_start": jnp.zeros((batch,), jnp.float32),
        "window_size": jnp.full((batch,), 30.0, jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    t_dummy = jnp.zeros((batch, 2 * nf + 2 * nq, 2))
    params = model.init({"params": key, "dropout": key},
                        example["v_feats"], example["a_feats"],
                        t_dummy, nq, nq, deterministic=True)["params"]

    if mode == "int8":
        qcfg = dataclasses.replace(cfg, quantized_inference=True)
        qmodel = TimDetection(qcfg)
        params = quant.quantize_params(params)
        t_full = jnp.concatenate(
            [example["times"], jnp.zeros((batch, 2 * nq, 2), jnp.float32)],
            axis=1)
        calibrated = quant.calibrate_act_scales(
            lambda vs, b_, m: qmodel.apply(
                vs, example["v_feats"], example["a_feats"], t_full, nq, nq,
                deterministic=True, mutable=m),
            {"params": params}, [None])
        scfg = dataclasses.replace(
            qcfg, quant_static_acts=True,
            quant_act_scales=quant.act_scales_tuple(calibrated),
            fast_scores=True)
        infer = make_inference_step(TimDetection(scfg), scfg)
    else:
        infer = make_inference_step(model, cfg)

    def chained_fn(p, ex):
        def body(_, carry):
            pe = dict(ex)
            pe["v_feats"] = ex["v_feats"] + carry
            out = infer(p, pe)
            return jnp.max(out["v_scores"]).astype(
                jnp.float32) * jnp.float32(1e-6)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    print(f"devices: {jax.devices()}  mode={mode} batch={batch}",
          flush=True)
    results = {}
    for tag, opts in SWEEP:
        try:
            fn = jax.jit(chained_fn, compiler_options=opts or None)
            float(fn(params, example))
            t0 = time.perf_counter()
            float(fn(params, example))
            dt = time.perf_counter() - t0
            wps = batch * iters / dt
            results[tag] = wps
            print(f"[xla-sweep] {tag:18s} {wps:8.1f} win/s  ({opts})",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"[xla-sweep] {tag:18s} REJECTED: {msg}", flush=True)
    if "baseline" in results:
        base = results["baseline"]
        best = max(results, key=results.get)
        print(f"[xla-sweep] best: {best} {results[best]:.1f} win/s "
              f"({results[best] / base:+.1%} vs baseline)", flush=True)


if __name__ == "__main__":
    main()
