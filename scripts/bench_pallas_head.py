"""A/B: serving headline (int8 static + fast_scores) with and without
the Mosaic fused int8 classifier-head kernel (quant_pallas_heads)."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tim_tpu import config as C
    from tim_tpu.models import TimDetection
    from tim_tpu.models.queries import generate_query_pyramid
    from tim_tpu.ops import quant
    from tim_tpu.train.detection import make_inference_step

    batch, iters = 128, 30
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
    qcfg = dataclasses.replace(cfg, quantized_inference=True)
    qmodel = TimDetection(qcfg)
    qparams = quant.quantize_params(params)
    t_full = jnp.concatenate(
        [example["times"], jnp.zeros((batch, 2 * nq, 2), jnp.float32)],
        axis=1)
    calibrated = quant.calibrate_act_scales(
        lambda vs, b_, m: qmodel.apply(
            vs, example["v_feats"], example["a_feats"], t_full, nq, nq,
            deterministic=True, mutable=m),
        {"params": qparams}, [None])
    scales = quant.act_scales_tuple(calibrated)
    print("devices:", jax.devices(), flush=True)

    outs = {}
    for tag, ph in (("xla_heads", False), ("pallas_heads", True)):
        scfg = dataclasses.replace(
            qcfg, quant_static_acts=True, quant_act_scales=scales,
            fast_scores=True, quant_pallas_heads=ph)
        infer = make_inference_step(TimDetection(scfg), scfg)

        @jax.jit
        def chained(p, ex):
            def body(_, carry):
                pe = dict(ex)
                pe["v_feats"] = ex["v_feats"] + carry
                out = infer(p, pe)
                return jnp.max(out["v_scores"]).astype(
                    jnp.float32) * jnp.float32(1e-6)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        try:
            float(chained(qparams, example))
            t0 = time.perf_counter()
            float(chained(qparams, example))
            dt = time.perf_counter() - t0
            wps = batch * iters / dt
            outs[tag] = wps
            print(f"[ab] {tag}: {wps:.1f} windows/s", flush=True)
        except Exception as e:
            print(f"[ab] {tag} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

        # score parity spot check (first window, first queries)
        try:
            out = jax.jit(infer)(qparams, example)
            outs[tag + "_probe"] = np.asarray(
                out["v_scores"][:1, :8, :8], np.float32)
        except Exception:
            pass

    if "xla_heads_probe" in outs and "pallas_heads_probe" in outs:
        d = np.abs(outs["xla_heads_probe"] - outs["pallas_heads_probe"])
        print(f"[ab] score delta max {d.max():.2e}", flush=True)
    if "xla_heads" in outs and "pallas_heads" in outs:
        print(f"[ab] speedup {outs['pallas_heads'] / outs['xla_heads']:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
