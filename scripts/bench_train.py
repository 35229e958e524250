"""Training-step throughput (not run by the driver; bench.py stays the
single-line inference benchmark). Chained-in-jit timing like bench.py."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from tim_tpu import config as C
from tim_tpu.models import TimDetection, TimRecognition
from tim_tpu.models.queries import generate_query_pyramid
from tim_tpu.train import detection as det_train
from tim_tpu.train import recognition as rec_train
from tim_tpu.train.optim import make_optimizer
from tim_tpu.train.state import create_train_state


def chained_steps(step, state, batch, rng, iters):
    @jax.jit
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
    float(run(state, batch))
    t0 = time.perf_counter()
    out = float(run(state, batch))
    return time.perf_counter() - t0


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
    dt = chained_steps(step, state, batch, key, iters)
    print(f"recognition train: {batch_size * iters / dt:.0f} windows/s "
          f"(batch {batch_size})")


def bench_detection(batch_size=32, iters=10):
    cfg = C.epic_detection()
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
    dt = chained_steps(step, state, batch, key, iters)
    print(f"detection train: {batch_size * iters / dt:.0f} windows/s "
          f"(batch {batch_size})")


if __name__ == "__main__":
    import sys
    sizes = [int(a) for a in sys.argv[1:]]
    bench_recognition()
    for bs in sizes or [32]:
        bench_detection(batch_size=bs)
