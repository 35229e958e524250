"""Bisect the detection-graph crash of
``xla_tpu_enable_experimental_fusion_cost_model`` (VERDICT r3 task 5).

The flag wins +10-12% on the recognition train step but crashed the
relay compiler on the round-3 detection train graph. This script
AOT-compiles a ladder of detection train-step variants with the flag
on and reports which flips compile-ok into a crash.

Measured on v5e (round 4, docs/PERFORMANCE.md):
- shipped defaults (rbg keys + uint8 masks): COMPILE-OK; timed 288
  win/s without the flag vs 283 with it -> the flag stays
  recognition-only.
- threefry + bernoulli masks (bits=32, the round-3 config): CRASH
  reproduced (relay HTTP 500, tpu_compile_helper exit 1).
- threefry + uint8 masks, threefry + dropout=0, and full-loss grads
  WITHOUT the optimizer update (threefry bernoulli): all COMPILE-OK.
=> the trigger is threefry 32-bit bernoulli mask generation inside the
full fused train step; both shipped dropout paths avoid it.

Run: python scripts/bisect_fusion_crash.py [--batch 64]
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

OPTS = {"xla_tpu_enable_experimental_fusion_cost_model": "true"}


def build(batch):
    import jax
    import jax.numpy as jnp

    from tim_tpu import config as C
    from tim_tpu.models import TimDetection
    from tim_tpu.models.queries import generate_query_pyramid

    cfg = C.epic_detection()
    nf = cfg.num_feats
    nq = generate_query_pyramid(cfg.inference_query_size).shape[0]
    na_gt = 8
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
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
    return cfg, model, variables, batch_d, nq, key


def try_compile(tag, jitted, *args):
    import jax

    try:
        jitted.lower(*args).compile()
        print(f"[bisect] {tag}: COMPILE-OK", flush=True)
        return True
    except Exception as exc:
        msg = str(exc).replace("\n", " ")[:220]
        print(f"[bisect] {tag}: CRASH {type(exc).__name__}: {msg}",
              flush=True)
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tim_tpu import config as C
    from tim_tpu.models import TimDetection
    from tim_tpu.train import detection as det_train
    from tim_tpu.train.optim import make_optimizer
    from tim_tpu.train.state import create_train_state, training_rng

    print("devices:", jax.devices(), flush=True)
    cfg, model, variables, batch_d, nq, key = build(args.batch)
    tcfg = C.TrainConfig()
    tx = make_optimizer(tcfg.lr, 0.05, 10000, 100)
    state = create_train_state(variables["params"], tx,
                               normaliser=tcfg.normaliser_init)
    step_rng = training_rng(0, tcfg.rng_impl)

    def full_step(tcfg_v, tag, cfg_v=None):
        m = TimDetection(cfg_v) if cfg_v is not None else model
        step = jax.jit(det_train.make_train_step(m, cfg_v or cfg, tcfg_v),
                       compiler_options=OPTS)
        rng_v = training_rng(0, tcfg_v.rng_impl)
        return try_compile(tag, step, state, batch_d, rng_v)

    # 1. control: the full train step (crashed with threefry in round 3;
    # re-test with the shipped rbg dropout)
    ok_rbg = full_step(tcfg, "full train step (rbg dropout)")
    if ok_rbg:
        # the flag compiles now — time it vs the unflagged step (it won
        # +10-12% on recognition; was never timeable on detection)
        import time as _time

        def timed(opts, tag):
            # the inner step must NOT carry compiler_options (JAX rejects
            # them on nested jits); only the top-level jit below does.
            step = det_train.make_train_step(model, cfg, tcfg)

            def run(state, batch):
                def body(i, carry):
                    s, _ = carry
                    s, metrics = step(s, batch, step_rng)
                    return (s, metrics["loss"])
                s, loss = jax.lax.fori_loop(0, 10, body,
                                            (state, jnp.float32(0.0)))
                return loss + jax.tree_util.tree_leaves(
                    s.params)[0].sum().astype(jnp.float32) * 1e-9

            # compiler_options must ride the TOP-LEVEL jit to reach the
            # remote compiler (docs/PERFORMANCE.md round 2)
            runj = jax.jit(run, compiler_options=opts)
            float(runj(state, batch_d))
            t0 = _time.perf_counter()
            float(runj(state, batch_d))
            dt = (_time.perf_counter() - t0) / 10
            print(f"[bisect] {tag}: {args.batch / dt:.0f} win/s "
                  f"({dt * 1e3:.1f} ms/step)", flush=True)

        timed(None, "detection train b64, no flag")
        timed(OPTS, "detection train b64, fusion-cost-model ON")

    # 2. rng implementation: threefry was the round-3 crasher. Repro
    # with the historical bernoulli masks (dropout_bits=32), with the
    # new uint8 masks, and with dropout off (isolates mask *generation*
    # from key-derivation threefry which every variant shares).
    tcfg_tf = dataclasses.replace(tcfg, rng_impl="threefry2x32")
    cfg32 = dataclasses.replace(cfg, dropout_bits=32)
    ok_tf32 = full_step(tcfg_tf, "threefry + bernoulli masks (bits=32)",
                        cfg32)
    full_step(tcfg_tf, "threefry + uint8 masks (bits=8)")
    cfg_nodrop = dataclasses.replace(cfg32, enc_dropout=0.0,
                                     feat_dropout=0.0, seq_dropout=0.0)
    full_step(tcfg_tf, "threefry + dropout=0", cfg_nodrop)
    if ok_tf32:
        # nothing crashes anymore — the finer ladder below is moot
        print("[bisect] threefry bits=32 compiles: round-3 crash is "
              "not reproducible on this relay build", flush=True)
        return

    # the ladder below bisects the CRASHING config: bernoulli masks
    # (bits=32) drawn from threefry keys
    model = TimDetection(cfg32)
    cfg = cfg32
    tcfg = tcfg_tf
    step_rng = training_rng(0, tcfg_tf.rng_impl)

    # full loss grads WITHOUT the optimizer update
    def grads_only(params, batch, rng):
        step = det_train.make_train_step(model, cfg, tcfg)
        # reuse the internal loss by running value_and_grad via the step's
        # closure is not accessible; approximate with label_queries + the
        # modality losses, matching the real loss structure.
        from tim_tpu.models import queries as Q
        pool = jnp.asarray(Q.generate_query_pyramid(cfg.train_query_size))
        r1, r2, rd = jax.random.split(rng, 3)
        v_qs = Q.sample_train_queries(r1, pool, nq)
        a_qs = Q.sample_train_queries(r2, pool, nq)
        bsz = batch["times"].shape[0]
        v_queries = jnp.broadcast_to(v_qs[None], (bsz, nq, 2))
        a_queries = jnp.broadcast_to(a_qs[None], (bsz, nq, 2))

        def loss_fn(p):
            vv = {"params": p}
            te_parts = [model.apply(vv, batch["times"],
                                    method=TimDetection.encode_times)]
            for qs in (v_qs, a_qs):
                te_q = model.apply(vv, qs[None],
                                   method=TimDetection.encode_times)
                te_parts.append(jnp.broadcast_to(te_q,
                                                 (bsz,) + te_q.shape[1:]))
            te = jnp.concatenate(te_parts, axis=1)
            cls_logits, reg_preds, _ = model.apply(
                vv, batch["v_feats"], batch["a_feats"], te, nq, nq,
                deterministic=False, rngs={"dropout": rd},
                method=TimDetection.encoder_forward)
            v_labels_raw = jnp.stack(
                [batch["verb"], batch["noun"], batch["action"]], axis=-1)
            v_t, v_l, v_i = Q.label_queries(
                v_queries, batch["v_gt_segments"], v_labels_raw,
                cfg.iou_threshold)
            v_cls, v_reg, _, _ = det_train._modality_losses(
                cls_logits, reg_preds[0], v_t, v_l, v_i, cfg, tcfg,
                jnp.float32(tcfg.normaliser_init), "visual")
            a_t, a_l, a_i = Q.label_queries(
                a_queries, batch["a_gt_segments"],
                batch["class_id"][..., None], cfg.iou_threshold)
            a_cls, a_reg, _, _ = det_train._modality_losses(
                cls_logits, reg_preds[1], a_t, a_l, a_i, cfg, tcfg,
                jnp.float32(tcfg.normaliser_init), "audio")
            return v_cls + v_reg + tcfg.lambda_audio * (a_cls + a_reg)

        return jax.grad(loss_fn)(params)

    try_compile("full loss grads (no optimizer)",
                jax.jit(grads_only, compiler_options=OPTS),
                state.params, batch_d, step_rng)


if __name__ == "__main__":
    main()
