"""Benchmark: dense multi-window detection inference throughput.

This is the production serving path of TIM detection — every 30 s window of
an untrimmed video is scored against the full multi-scale query pyramid
(399 interval queries per modality, EPIC audio-visual config: d_model 512,
6 layers, 100 context tokens, 898-token sequence) — matching the
reference's ``--extract_feats`` dense dump
(``detection/scripts/extract_feats.py``).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference implementation on one A100-80GB. The reference
repo publishes no throughput numbers (BASELINE.md), so the anchor is an
analytic estimate, deliberately generous to the reference: ~115 GFLOPs per
window (dense [898x898] masked attention, fp16) at 35% MFU on A100's
312 TFLOPs = ~950 windows/s. vs_baseline = measured / 950.

Measured same-chip anchor: a faithful port of the reference's dense
[S, S]-masked attention (everything else identical) reaches 463 windows/s
on this v5e vs ~935 for the structured design — the TPU-first rebuild is
2.0x the direct port on identical hardware, before accounting for the
real reference's eager-torch and [B*heads, S, S] mask-materialization
overheads. The A100 constant above therefore overstates the reference.
"""

import json
import sys
import time

import numpy as np

BASELINE_A100_WINDOWS_PER_SEC = 950.0


def main():
    import jax
    import jax.numpy as jnp

    from tim_tpu import config as C
    from tim_tpu.models import TimDetection
    from tim_tpu.models.queries import generate_query_pyramid
    from tim_tpu.train.detection import make_inference_step

    cfg = C.epic_detection(compute_dtype="bfloat16")
    model = TimDetection(cfg)
    infer = jax.jit(make_inference_step(model, cfg))

    nq = generate_query_pyramid(cfg.inference_query_size).shape[0]
    nf = cfg.num_feats
    batch = 128
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
    params_rng = {"params": key, "dropout": key}
    t_dummy = jnp.zeros((batch, 2 * nf + 2 * nq, 2))
    variables = model.init(params_rng, example["v_feats"],
                           example["a_feats"], t_dummy, nq, nq,
                           deterministic=True)
    params = variables["params"]

    # Timing methodology: chain the iterations *inside one jit* with a
    # data dependency and fetch a scalar at the end. Per-call host timing
    # is unreliable here: block_until_ready does not actually block on the
    # axon relay backend, and a host fetch per call adds ~30 ms of tunnel
    # RTT. The chained loop measures pure device throughput.
    iters = 30

    @jax.jit
    def chained(params, ex):
        def body(_, carry):
            perturbed = dict(ex)
            perturbed["v_feats"] = ex["v_feats"] + carry
            out = infer(params, perturbed)
            return jnp.max(out["v_scores"]) * jnp.float32(1e-6)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chained(params, example))  # compile + warm
    start = time.perf_counter()
    float(chained(params, example))
    elapsed = time.perf_counter() - start

    windows_per_sec = batch * iters / elapsed
    print(
        f"[bench] {windows_per_sec:.1f} windows/s "
        f"({windows_per_sec * 2 * nq:.0f} query-intervals/s, batch {batch}, "
        f"{iters} iters, {elapsed:.3f}s, device {jax.devices()[0]})",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "dense_detection_inference_windows_per_sec_per_chip",
        "value": round(windows_per_sec, 2),
        "unit": "windows/s",
        "vs_baseline": round(
            windows_per_sec / BASELINE_A100_WINDOWS_PER_SEC, 3),
    }))
    sys.stdout.flush()

    # Secondary: calibrated static-int8 serving mode (accuracy-bounded in
    # tests/test_quant.py; the headline stays on the parity-grade bf16
    # path). Runs AFTER the JSON line so a hang here can't break the
    # driver contract; skipped on any failure.
    try:
        import dataclasses

        from tim_tpu.ops import quant

        qcfg = dataclasses.replace(cfg, quantized_inference=True)
        qmodel = TimDetection(qcfg)
        qvars = {"params": quant.quantize_params(params)}

        # cheap calibration: one benchmark batch through the dynamic path
        # with the calibration collection mutable; scales bake as
        # compile-time constants in the serving config
        t_full = jnp.concatenate(
            [example["times"],
             jnp.zeros((batch, 2 * nq, 2), jnp.float32)], axis=1)
        calibrated = quant.calibrate_act_scales(
            lambda vs, b_, m: qmodel.apply(
                vs, example["v_feats"], example["a_feats"], t_full, nq, nq,
                deterministic=True, mutable=m),
            qvars, [None])
        scfg = dataclasses.replace(
            qcfg, quant_static_acts=True,
            quant_act_scales=quant.act_scales_tuple(calibrated))
        calibrated = qvars["params"]  # const path needs no act_scale params
        sinfer = jax.jit(make_inference_step(TimDetection(scfg), scfg))

        @jax.jit
        def chained_q(p, e):
            def body(_, carry):
                pe = dict(e)
                pe["v_feats"] = e["v_feats"] + carry
                return jnp.max(sinfer(p, pe)["v_scores"]).astype(
                    jnp.float32) * jnp.float32(1e-6)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        float(chained_q(calibrated, example))
        t0 = time.perf_counter()
        float(chained_q(calibrated, example))
        q_elapsed = time.perf_counter() - t0
        print(f"[bench] int8 static serving mode: "
              f"{batch * iters / q_elapsed:.1f} windows/s "
              f"(vs_baseline {batch * iters / q_elapsed / BASELINE_A100_WINDOWS_PER_SEC:.3f})",
              file=sys.stderr)
    except Exception as exc:  # pragma: no cover
        print(f"[bench] int8 mode skipped: {exc}", file=sys.stderr)


if __name__ == "__main__":
    main()
