"""Training-step throughput (not run by the driver; bench.py stays the
single-line inference benchmark). Chained-in-jit timing like bench.py."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tim_tpu import config as C
from tim_tpu.models import TimDetection, TimRecognition
from tim_tpu.models.queries import generate_query_pyramid
from tim_tpu.train import detection as det_train
from tim_tpu.train import recognition as rec_train
from tim_tpu.train.optim import make_optimizer
from tim_tpu.train.state import create_train_state, training_rng


def chained_steps(step, state, batch, rng, iters, compiler_options=None):
    """Returns (seconds for one chained call, XLA FLOPs per step).
    FLOPs come from the same compile used for timing (remote TPU
    compiles are minutes-slow; don't compile twice): the fori_loop body
    runs ``iters`` times and the loop epilogue adds a negligible sum."""
    @partial(jax.jit, compiler_options=compiler_options)
    def run(state, batch):
        def body(i, carry):
            s, _ = carry
            s, metrics = step(s, batch, rng)
            return (s, metrics["loss"])
        s, loss = jax.lax.fori_loop(0, iters, body,
                                    (state, jnp.float32(0.0)))
        # depend on the final state so nothing dead-codes
        return loss + jax.tree_util.tree_leaves(s.params)[0].sum().astype(
            jnp.float32) * 1e-9
    compiled = run.lower(state, batch).compile()
    try:
        flops = float(compiled.cost_analysis()["flops"]) / iters
    except Exception:
        flops = float("nan")
    float(compiled(state, batch))
    t0 = time.perf_counter()
    float(compiled(state, batch))
    return time.perf_counter() - t0, flops


def bench_recognition(batch_size=64, iters=10):
    cfg = C.epic_recognition()
    tcfg = C.TrainConfig()
    nv, na = 6, 4
    nf = cfg.num_feats
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    batch = {
        "v_feats": jnp.asarray(rng.normal(
            size=(batch_size, nf, cfg.visual_input_dim)), jnp.float32),
        "a_feats": jnp.asarray(rng.normal(
            size=(batch_size, nf, cfg.audio_input_dim)), jnp.float32),
        "times": jnp.asarray(rng.uniform(
            size=(batch_size, 2 * nf + nv + na, 2)), jnp.float32),
        "verb": jnp.asarray(rng.integers(-1, 97, (batch_size, nv))),
        "noun": jnp.asarray(rng.integers(-1, 300, (batch_size, nv))),
        "action": jnp.asarray(rng.integers(-1, 3806, (batch_size, nv))),
        "class_id": jnp.asarray(rng.integers(-1, 44, (batch_size, na))),
    }
    model = TimRecognition(cfg)
    variables = model.init({"params": key, "dropout": key},
                           batch["v_feats"], batch["a_feats"],
                           batch["times"], nv, na, deterministic=True)
    tx = make_optimizer(tcfg.lr, tcfg.weight_decay, 10000, 100)
    state = create_train_state(variables["params"], tx)
    step = rec_train.make_train_step(model, cfg, tcfg, nv, na)
    # measure the shipped default: the recognition runner passes the
    # fusion-cost-model flag on its train jits (TrainConfig)
    opts = None
    if tcfg.xla_fusion_cost_model and jax.default_backend() != "cpu":
        opts = {"xla_tpu_enable_experimental_fusion_cost_model": "true"}
    dt, fl = chained_steps(step, state, batch,
                           training_rng(0, tcfg.rng_impl), iters,
                           compiler_options=opts)

    # forward/backward attribution via the eval step (same forward +
    # losses, no grad/update, dropout off)
    ev = rec_train.make_eval_step(model, cfg, tcfg, nv, na)

    @jax.jit
    def ev_run(params, batch):
        def body(i, carry):
            # carry feeds the inputs so XLA cannot hoist the forward
            # out of the loop (CLAUDE.md timing methodology)
            b2 = dict(batch)
            b2["v_feats"] = batch["v_feats"] + carry
            logits, losses = ev(params, b2)
            return losses["loss_action"].astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    evc = ev_run.lower(state.params, batch).compile()
    try:
        efl = float(evc.cost_analysis()["flops"]) / iters
    except Exception:
        efl = float("nan")
    float(evc(state.params, batch))
    t0 = time.perf_counter()
    float(evc(state.params, batch))
    edt = time.perf_counter() - t0
    fwd_ms, full_ms = edt / iters * 1e3, dt / iters * 1e3
    print(f"recognition attribution: forward+loss {fwd_ms:.2f} ms "
          f"(XLA-counted {efl / batch_size / 1e9:.1f} GFLOP/win — "
          f"cost_analysis undercounts loop trips in some jax builds; "
          f"trust the ms) | backward+opt {full_ms - fwd_ms:.2f} ms "
          f"({(full_ms - fwd_ms) / fwd_ms:.2f}x the forward)")

    wps = batch_size * iters / dt
    print(f"recognition train: {wps:.0f} windows/s (batch {batch_size}); "
          f"XLA {fl / batch_size / 1e9:.1f} GFLOP/window -> "
          f"{wps * fl / batch_size / 1e12:.1f} TF/s achieved")


def bench_detection(batch_size=32, iters=10, remat=False):
    cfg = C.epic_detection(remat=remat)
    tcfg = C.TrainConfig()
    nf = cfg.num_feats
    nq = generate_query_pyramid(cfg.inference_query_size).shape[0]
    na_gt = 8
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    batch = {
        "v_feats": jnp.asarray(rng.normal(
            size=(batch_size, nf, cfg.visual_input_dim)), jnp.float32),
        "a_feats": jnp.asarray(rng.normal(
            size=(batch_size, nf, cfg.audio_input_dim)), jnp.float32),
        "times": jnp.asarray(rng.uniform(size=(batch_size, 2 * nf, 2)),
                             jnp.float32),
        "v_gt_segments": jnp.asarray(np.sort(rng.uniform(
            0, 1, (batch_size, na_gt, 2)), -1), jnp.float32),
        "a_gt_segments": jnp.asarray(np.sort(rng.uniform(
            0, 1, (batch_size, na_gt, 2)), -1), jnp.float32),
        "verb": jnp.asarray(rng.integers(-1, 97, (batch_size, na_gt))),
        "noun": jnp.asarray(rng.integers(-1, 300, (batch_size, na_gt))),
        "action": jnp.asarray(rng.integers(-1, 3806, (batch_size, na_gt))),
        "class_id": jnp.asarray(rng.integers(-1, 44, (batch_size, na_gt))),
    }
    model = TimDetection(cfg)
    t_dummy = jnp.zeros((batch_size, 2 * nf + 2 * nq, 2))
    variables = model.init({"params": key, "dropout": key},
                           batch["v_feats"], batch["a_feats"], t_dummy,
                           nq, nq, deterministic=True)
    tx = make_optimizer(tcfg.lr, 0.05, 10000, 100)
    state = create_train_state(variables["params"], tx,
                               normaliser=tcfg.normaliser_init)
    step = det_train.make_train_step(model, cfg, tcfg)
    dt, fl = chained_steps(step, state, batch,
                           training_rng(0, tcfg.rng_impl), iters)
    wps = batch_size * iters / dt
    if remat:
        print("  [remat=True]")
    print(f"detection train: {wps:.0f} windows/s (batch {batch_size}); "
          f"XLA {fl / batch_size / 1e9:.1f} GFLOP/window -> "
          f"{wps * fl / batch_size / 1e12:.1f} TF/s achieved")

    # forward/backward attribution: the val step is the same forward +
    # losses without grad/update (dropout off, fixed grid — same query
    # count); t_train - t_val ~ backward + optimizer cost
    val = det_train.make_val_step(model, cfg, tcfg)

    @jax.jit
    def val_run(state, batch):
        def body(i, carry):
            b2 = dict(batch)
            b2["v_feats"] = batch["v_feats"] + carry
            m = val(state, b2)
            return m["loss"].astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    vc = val_run.lower(state, batch).compile()
    try:
        vfl = float(vc.cost_analysis()["flops"]) / iters
    except Exception:
        vfl = float("nan")
    float(vc(state, batch))
    t0 = time.perf_counter()
    float(vc(state, batch))
    vdt = time.perf_counter() - t0
    fwd_ms = vdt / iters * 1e3
    full_ms = dt / iters * 1e3
    print(f"  attribution: forward+loss {fwd_ms:.1f} ms "
          f"(XLA-counted {vfl / batch_size / 1e9:.1f} GFLOP/win) | "
          f"backward+opt {full_ms - fwd_ms:.1f} ms "
          f"({(full_ms - fwd_ms) / fwd_ms:.2f}x the forward)")


if __name__ == "__main__":
    args = sys.argv[1:]
    det_only = args and args[0] == "det"
    if det_only:
        args = args[1:]
    remat = args and args[0] == "remat"
    if remat:
        args = args[1:]
    sizes = [int(a) for a in args]
    if not det_only:
        bench_recognition()
    for bs in sizes or [32]:
        bench_detection(batch_size=bs, remat=remat)
