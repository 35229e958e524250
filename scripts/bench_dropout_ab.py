"""A/B the uint8-mask dropout (ModelConfig.dropout_bits=8) on the train
steps (VERDICT r3 task 5b).

Round-3 attribution: rbg dropout already took detection 208->246 win/s
and the dropout-off floor is 303 — the residual gap is mask generation
+ apply. coarse_dropout generates 4x fewer bits per mask; this times
recognition b64 and detection b64 train steps for bits=32 (shipped)
vs bits=8, same harness as scripts/bench_train.py.

Run: python scripts/bench_dropout_ab.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench_train import chained_steps  # noqa: E402 (scripts/ sibling)
from tim_tpu import config as C
from tim_tpu.models import TimDetection, TimRecognition
from tim_tpu.models.queries import generate_query_pyramid
from tim_tpu.train import detection as det_train
from tim_tpu.train import recognition as rec_train
from tim_tpu.train.optim import make_optimizer
from tim_tpu.train.state import create_train_state, training_rng


def recognition(bits, batch_size=64, iters=10):
    cfg = C.epic_recognition(dropout_bits=bits)
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
    opts = None
    if tcfg.xla_fusion_cost_model and jax.default_backend() != "cpu":
        opts = {"xla_tpu_enable_experimental_fusion_cost_model": "true"}
    dt, _ = chained_steps(step, state, batch,
                          training_rng(0, tcfg.rng_impl), iters,
                          compiler_options=opts)
    print(f"[dropout-ab] recognition b{batch_size} bits={bits}: "
          f"{batch_size * iters / dt:.0f} win/s "
          f"({dt / iters * 1e3:.1f} ms/step)", flush=True)


def detection(bits, batch_size=64, iters=10):
    cfg = C.epic_detection(dropout_bits=bits)
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
    dt, _ = chained_steps(step, state, batch,
                          training_rng(0, tcfg.rng_impl), iters)
    print(f"[dropout-ab] detection b{batch_size} bits={bits}: "
          f"{batch_size * iters / dt:.0f} win/s "
          f"({dt / iters * 1e3:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=("detection", "recognition", "both"),
                    default="both")
    ap.add_argument("--bits", type=int, nargs="+", default=[32, 8],
                    help="dropout_bits variants to time (set "
                    "TIM_TPU_DROPOUT_MUL=1 to A/B the multiply-form "
                    "uint8 mask, VERDICT r4 #7)")
    args = ap.parse_args()
    print("devices:", jax.devices(),
          "DROPOUT_MUL=", os.environ.get("TIM_TPU_DROPOUT_MUL", "0"),
          flush=True)
    if args.task in ("detection", "both"):
        for bits in args.bits:
            detection(bits)
    if args.task in ("recognition", "both"):
        for bits in args.bits:
            recognition(bits)
