"""XLA compiler_options sweep on the top-level serving jit (VERDICT
round-2 task 7).

Mechanism note (CLAUDE.md): compiler_options DO reach the remote
compiler when passed on the TOP-LEVEL jit; XLA_FLAGS TPU flags are
rejected locally. Round-2 swept only scoped vmem (64/96MB, both losses);
this sweeps the latency-hiding scheduler and other documented TPU
toggles on the bf16 parity path and the int8-static headline. Unknown
options are reported as rejected rather than crashing the sweep.

Run:  python scripts/bench_xla_options.py [bf16|int8|rectrain|dettrain] [batch]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

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


def _train_chained(mode, batch, iters):
    """Build a chained train-step callable for the sweep (reuses the
    synthetic-batch builders in bench_train.py)."""
    import jax
    import jax.numpy as jnp

    from tim_tpu import config as C
    from tim_tpu.models import TimDetection, TimRecognition
    from tim_tpu.models.queries import generate_query_pyramid
    from tim_tpu.train import detection as det_train
    from tim_tpu.train import recognition as rec_train
    from tim_tpu.train.optim import make_optimizer
    from tim_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    tcfg = C.TrainConfig()
    # the step rng uses the shipped impl (rbg hardware RNG by default)
    from tim_tpu.train.state import training_rng
    step_key = training_rng(0, tcfg.rng_impl)
    if mode == "banktrain":
        from tim_tpu.data.device_bank import DeviceFeatureBank
        cfg = C.epic_recognition()
        nv, na = 6, 4
        nf = cfg.num_feats
        v_bank = DeviceFeatureBank({"v0": rng.normal(
            size=(2000, 2, cfg.visual_input_dim)).astype(np.float32)})
        a_bank = DeviceFeatureBank({"v0": rng.normal(
            size=(2000, 2, cfg.audio_input_dim)).astype(np.float32)})
        starts = rng.integers(0, 2000 - nf, (batch, 1))
        batch_d = {
            "feat_indices": jnp.asarray(
                starts + np.arange(nf)[None, :], jnp.int32),
            "times": jnp.asarray(rng.uniform(
                size=(batch, 2 * nf + nv + na, 2)), jnp.float32),
            "verb": jnp.asarray(rng.integers(-1, 97, (batch, nv))),
            "noun": jnp.asarray(rng.integers(-1, 300, (batch, nv))),
            "action": jnp.asarray(rng.integers(-1, 3806, (batch, nv))),
            "class_id": jnp.asarray(rng.integers(-1, 44, (batch, na))),
        }
        model = TimRecognition(cfg)
        v0, a0 = jnp.zeros((batch, nf, cfg.visual_input_dim)), \
            jnp.zeros((batch, nf, cfg.audio_input_dim))
        variables = model.init({"params": key, "dropout": key},
                               v0, a0, batch_d["times"], nv, na,
                               deterministic=True)
        tx = make_optimizer(tcfg.lr, tcfg.weight_decay, 10000, 100)
        state = create_train_state(variables["params"], tx)
        step = rec_train.make_bank_train_step(
            model, cfg, tcfg, nv, na, v_bank, a_bank)
    elif mode == "rectrain":
        cfg = C.epic_recognition()
        nv, na = 6, 4
        nf = cfg.num_feats
        batch_d = {
            "v_feats": jnp.asarray(rng.normal(
                size=(batch, nf, cfg.visual_input_dim)), jnp.float32),
            "a_feats": jnp.asarray(rng.normal(
                size=(batch, nf, cfg.audio_input_dim)), jnp.float32),
            "times": jnp.asarray(rng.uniform(
                size=(batch, 2 * nf + nv + na, 2)), jnp.float32),
            "verb": jnp.asarray(rng.integers(-1, 97, (batch, nv))),
            "noun": jnp.asarray(rng.integers(-1, 300, (batch, nv))),
            "action": jnp.asarray(rng.integers(-1, 3806, (batch, nv))),
            "class_id": jnp.asarray(rng.integers(-1, 44, (batch, na))),
        }
        model = TimRecognition(cfg)
        variables = model.init({"params": key, "dropout": key},
                               batch_d["v_feats"], batch_d["a_feats"],
                               batch_d["times"], nv, na,
                               deterministic=True)
        tx = make_optimizer(tcfg.lr, tcfg.weight_decay, 10000, 100)
        state = create_train_state(variables["params"], tx)
        step = rec_train.make_train_step(model, cfg, tcfg, nv, na)
    else:
        cfg = C.epic_detection()
        nf = cfg.num_feats
        nq = generate_query_pyramid(cfg.inference_query_size).shape[0]
        na_gt = 8
        batch_d = {
            "v_feats": jnp.asarray(rng.normal(
                size=(batch, nf, cfg.visual_input_dim)), jnp.float32),
            "a_feats": jnp.asarray(rng.normal(
                size=(batch, nf, cfg.audio_input_dim)), jnp.float32),
            "times": jnp.asarray(rng.uniform(size=(batch, 2 * nf, 2)),
                                 jnp.float32),
            "v_gt_segments": jnp.asarray(np.sort(rng.uniform(
                0, 1, (batch, na_gt, 2)), -1), jnp.float32),
            "a_gt_segments": jnp.asarray(np.sort(rng.uniform(
                0, 1, (batch, na_gt, 2)), -1), jnp.float32),
            "verb": jnp.asarray(rng.integers(-1, 97, (batch, na_gt))),
            "noun": jnp.asarray(rng.integers(-1, 300, (batch, na_gt))),
            "action": jnp.asarray(rng.integers(-1, 3806, (batch, na_gt))),
            "class_id": jnp.asarray(rng.integers(-1, 44, (batch, na_gt))),
        }
        model = TimDetection(cfg)
        t_dummy = jnp.zeros((batch, 2 * nf + 2 * nq, 2))
        variables = model.init({"params": key, "dropout": key},
                               batch_d["v_feats"], batch_d["a_feats"],
                               t_dummy, nq, nq, deterministic=True)
        tx = make_optimizer(tcfg.lr, 0.05, 10000, 100)
        state = create_train_state(variables["params"], tx,
                                   normaliser=tcfg.normaliser_init)
        step = det_train.make_train_step(model, cfg, tcfg)

    def chained_fn(state, batch_d):
        def body(i, carry):
            s, _ = carry
            s, metrics = step(s, batch_d, step_key)
            return (s, metrics["loss"])
        s, loss = jax.lax.fori_loop(0, iters, body,
                                    (state, jnp.float32(0.0)))
        return loss + jax.tree_util.tree_leaves(s.params)[0].sum().astype(
            jnp.float32) * 1e-9
    return chained_fn, state, batch_d


def main():
    import jax
    import jax.numpy as jnp

    from tim_tpu import config as C
    from tim_tpu.models import TimDetection
    from tim_tpu.models.queries import generate_query_pyramid
    from tim_tpu.ops import quant
    from tim_tpu.train.detection import make_inference_step

    mode = sys.argv[1] if len(sys.argv) > 1 else "int8"
    if mode in ("rectrain", "dettrain", "banktrain"):
        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
        iters = 10
        chained_fn, params, example = _train_chained(mode, batch, iters)
        _sweep(jax, chained_fn, params, example, mode, batch, iters)
        return

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

    _sweep(jax, chained_fn, params, example, mode, batch, iters)


def _sweep(jax, chained_fn, params, example, mode, batch, iters):
    print(f"devices: {jax.devices()}  mode={mode} batch={batch}",
          flush=True)
    only = os.environ.get("SWEEP_TAGS")
    entries = SWEEP
    if only:
        wanted = only.split(",")
        entries = [(t, o) for t, o in SWEEP for w in wanted if t == w]
    results = {}
    for tag, opts in entries:
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
              f"({results[best] / base - 1:+.1%} vs baseline)", flush=True)


if __name__ == "__main__":
    main()
