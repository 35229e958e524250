"""Benchmark: dense multi-window detection inference throughput.

This is the production serving path of TIM detection — every 30 s window of
an untrimmed video is scored against the full multi-scale query pyramid
(399 interval queries per modality, EPIC audio-visual config: d_model 512,
6 layers, 100 context tokens, 898-token sequence) — matching the
reference's ``--extract_feats`` dense dump
(``detection/scripts/extract_feats.py``).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

HEADLINE = the calibrated static-int8 serving mode (per-out-channel int8
weights + compile-time-constant activation scales, ``ops/quant.py``).
Accuracy-qualified on trained weights in ``tests/test_quant_accuracy.py``:
|delta avg mAP| <= 0.02, dense sigmoid score delta max <= 0.1 / mean
<= 0.01, recognition top-1 agreement >= 98% vs fp32. The parity-grade
bf16 number is printed to stderr; if the int8 path fails for any reason
the JSON falls back to bf16 so the driver contract holds.

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

(bf16 megafusion via Pallas was measured and documented as a dead end on
this chip — see ``ops/pallas_fused.py``; int8 is the serving lever.)
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_A100_WINDOWS_PER_SEC = 950.0


def _chained(infer, params, example, iters, score_key="v_scores"):
    """Timing methodology (CLAUDE.md): chain iterations inside one jit
    with a data dependency and fetch one scalar — block_until_ready does
    not block on the axon relay and per-call fetches add ~30 ms RTT."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(p, ex):
        def body(_, carry):
            pe = dict(ex)
            pe["v_feats"] = ex["v_feats"] + carry
            out = infer(p, pe)
            return jnp.max(out[score_key]).astype(
                jnp.float32) * jnp.float32(1e-6)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chained(params, example))  # compile + warm
    start = time.perf_counter()
    float(chained(params, example))
    return time.perf_counter() - start


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tim_tpu import config as C
    from tim_tpu.models import TimDetection
    from tim_tpu.models.queries import generate_query_pyramid
    from tim_tpu.ops import quant
    from tim_tpu.train.detection import make_inference_step

    cfg = C.epic_detection(compute_dtype="bfloat16")
    model = TimDetection(cfg)
    infer = jax.jit(make_inference_step(model, cfg))

    nq = generate_query_pyramid(cfg.inference_query_size).shape[0]
    nf = cfg.num_feats
    # batch sweep (round 2): 64=902, 128=1166 (headline), 192/256 lose
    # — env override for batch experiments only
    batch = int(os.environ.get("TIM_TPU_BENCH_BATCH", "128"))
    iters = 30
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
    variables = model.init({"params": key, "dropout": key},
                           example["v_feats"], example["a_feats"],
                           t_dummy, nq, nq, deterministic=True)
    params = variables["params"]

    elapsed = _chained(infer, params, example, iters)
    bf16_wps = batch * iters / elapsed
    print(
        f"[bench] bf16 parity path: {bf16_wps:.1f} windows/s "
        f"({bf16_wps * 2 * nq:.0f} query-intervals/s, batch {batch}, "
        f"{iters} iters, {elapsed:.3f}s, device {jax.devices()[0]})",
        file=sys.stderr,
    )

    # Headline: calibrated static-int8 serving mode (accuracy-qualified in
    # tests/test_quant_accuracy.py — see module docstring for the bounds).
    headline = ("dense_detection_inference_windows_per_sec_per_chip_bf16",
                bf16_wps)
    try:
        qcfg = dataclasses.replace(cfg, quantized_inference=True)
        qmodel = TimDetection(qcfg)
        qparams = quant.quantize_params(params)

        t_full = jnp.concatenate(
            [example["times"],
             jnp.zeros((batch, 2 * nq, 2), jnp.float32)], axis=1)
        calibrated = quant.calibrate_act_scales(
            lambda vs, b_, m: qmodel.apply(
                vs, example["v_feats"], example["a_feats"], t_full, nq, nq,
                deterministic=True, mutable=m),
            {"params": qparams}, [None])
        scfg = dataclasses.replace(
            qcfg, quant_static_acts=True,
            quant_act_scales=quant.act_scales_tuple(calibrated),
            fast_scores=True)
        sinfer = jax.jit(make_inference_step(TimDetection(scfg), scfg))

        q_elapsed = _chained(sinfer, qparams, example, iters)
        q_wps = batch * iters / q_elapsed
        print(f"[bench] int8 static + bf16-scores serving mode: "
              f"{q_wps:.1f} windows/s "
              f"(accuracy bound: |dmAP|<=0.02, top-1 agreement >=98%, "
              f"max dense-score delta <=0.1, "
              f"tests/test_quant_accuracy.py)", file=sys.stderr)
        headline = (
            "dense_detection_inference_windows_per_sec_per_chip_int8",
            q_wps)
    except Exception as exc:  # pragma: no cover
        print(f"[bench] int8 mode failed, bf16 headline: {exc}",
              file=sys.stderr)

    metric, wps = headline
    print(json.dumps({
        "metric": metric,
        "value": round(wps, 2),
        "unit": "windows/s",
        "vs_baseline": round(wps / BASELINE_A100_WINDOWS_PER_SEC, 3),
    }))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
