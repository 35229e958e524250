"""Detection-training backward micro-attribution (run on the chip).

The train-step attribution (scripts/bench_train.py) shows backward+opt at
3.15x the forward where ideal autodiff is ~2x — an ~85 ms/step excess at
b64. This script splits that excess into its candidate causes:

1. Dropout mask generation. The forward baseline (val step) runs with
   dropout OFF, so the cost of drawing ~2.4G random bits/step (six layers
   of [B,898,4096] FFN masks + attention-weight masks, threefry2x32 on
   the VPU) is silently attributed to "backward". Timed here: the shipped
   threefry path vs the TPU hardware-RNG `rbg`/`unsafe_rbg` PRNG impls vs
   dropout-off training (the floor).
2. Backward matmul efficiency. Times the exact dW/dX dot_generals autodiff
   emits for the FFN and the 3806-class head as standalone programs, vs
   their forward shapes — if these run at forward TF/s in isolation, the
   remaining gap is scheduling/fusion, not a layout property.

Usage:  python scripts/bench_bwd_micro.py [part ...]
        parts: train, matmul, attn (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tim_tpu import config as C
from tim_tpu.models import TimDetection
from tim_tpu.models.queries import generate_query_pyramid
from tim_tpu.train import detection as det_train
from tim_tpu.train.optim import make_optimizer
from tim_tpu.train.state import create_train_state


def make_batch(cfg, batch_size, na_gt=8):
    nf = cfg.num_feats
    rng = np.random.default_rng(0)
    return {
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


def time_chained_train(step, state, batch, rng, iters):
    @jax.jit
    def run(state, batch):
        def body(i, carry):
            s, _ = carry
            s, metrics = step(s, batch, rng)
            return (s, metrics["loss"])
        s, loss = lax.fori_loop(0, iters, body, (state, jnp.float32(0.0)))
        return loss + jax.tree_util.tree_leaves(s.params)[0].sum().astype(
            jnp.float32) * 1e-9
    float(run(state, batch))
    t0 = time.perf_counter()
    float(run(state, batch))
    return (time.perf_counter() - t0) / iters


def part_train(batch_size=64, iters=10):
    tcfg = C.TrainConfig()
    batch = None
    state = None

    def setup(cfg):
        nonlocal batch, state
        key = jax.random.PRNGKey(0)
        nq = generate_query_pyramid(cfg.inference_query_size).shape[0]
        b = make_batch(cfg, batch_size)
        model = TimDetection(cfg)
        t_dummy = jnp.zeros((batch_size, 2 * cfg.num_feats + 2 * nq, 2))
        variables = model.init({"params": key, "dropout": key},
                               b["v_feats"], b["a_feats"], t_dummy,
                               nq, nq, deterministic=True)
        tx = make_optimizer(tcfg.lr, 0.05, 10000, 100)
        st = create_train_state(variables["params"], tx,
                                normaliser=tcfg.normaliser_init)
        return model, st, b

    cfg = C.epic_detection()
    model, state, batch = setup(cfg)
    step = det_train.make_train_step(model, cfg, tcfg)

    for name, key in [
        ("threefry (shipped)", jax.random.PRNGKey(0)),
        ("rbg", jax.random.key(0, impl="rbg")),
        ("unsafe_rbg", jax.random.key(0, impl="unsafe_rbg")),
    ]:
        try:
            dt = time_chained_train(step, state, batch, key, iters)
        except Exception as e:  # pragma: no cover - impl support varies
            print(f"[train] {name}: FAILED ({type(e).__name__}: {e})",
                  flush=True)
            continue
        print(f"[train] dropout-on, {name}: {dt * 1e3:.1f} ms/step "
              f"({batch_size / dt:.0f} win/s)", flush=True)

    # dropout-off floor: same graph minus mask generation/application
    cfg0 = C.epic_detection(enc_dropout=0.0, feat_dropout=0.0,
                            seq_dropout=0.0)
    model0, state0, batch0 = setup(cfg0)
    step0 = det_train.make_train_step(model0, cfg0, tcfg)
    dt = time_chained_train(step0, state0, batch0,
                            jax.random.PRNGKey(0), iters)
    print(f"[train] dropout-off floor: {dt * 1e3:.1f} ms/step "
          f"({batch_size / dt:.0f} win/s)", flush=True)


def time_op(name, fn, *args, iters=20, flops=None):
    """Chained timing with a carry->input dependency and one scalar out."""
    @jax.jit
    def run(*args):
        def body(i, carry):
            out = fn(args[0] + carry * jnp.asarray(1e-9, args[0].dtype),
                     *args[1:])
            return out.astype(jnp.float32).max()
        return lax.fori_loop(0, iters, body, jnp.float32(0.0))
    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    dt = (time.perf_counter() - t0) / iters
    rate = f" -> {flops / dt / 1e12:.1f} TF/s" if flops else ""
    print(f"[matmul] {name}: {dt * 1e3:.2f} ms{rate}", flush=True)
    return dt


def part_matmul():
    rng = np.random.default_rng(0)
    B, S, D, F = 64, 898, 1024, 4096
    NQ, CC = 399, 3806
    n = B * S          # 57472 rows through the FFN
    nh = B * NQ        # 25536 rows through the visual head

    def mk(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.normal(size=shape) * 0.05, dtype)

    # FFN linear1 shapes (the biggest encoder matmul family)
    x = mk((n, D))
    w = mk((D, F))
    dy = mk((n, F))
    fl = 2 * n * D * F
    time_op("ffn fwd  x@W       [57472,1024]x[1024,4096]",
            lambda x, w: x @ w, x, w, flops=fl)
    # dW: contract the row axis of both operands (autodiff's dot_general)
    time_op("ffn dW   xT@dy     -> [1024,4096]",
            lambda x, dy: lax.dot_general(
                x, dy, (((0,), (0,)), ((), ()))), x, dy, flops=fl)
    # dX: dy @ W^T, contracting the F axis of both (no transpose op)
    time_op("ffn dX   dy@WT     -> [57472,1024]",
            lambda dy, w: lax.dot_general(
                dy, w, (((1,), (1,)), ((), ()))), dy, w, flops=fl)

    # 3806-class head
    xh = mk((nh, D))
    wh = mk((D, CC))
    dyh = mk((nh, CC))
    flh = 2 * nh * D * CC
    time_op("head fwd x@W       [25536,1024]x[1024,3806]",
            lambda x, w: x @ w, xh, wh, flops=flh)
    time_op("head dW  xT@dy     -> [1024,3806]",
            lambda x, dy: lax.dot_general(
                x, dy, (((0,), (0,)), ((), ()))), xh, dyh, flops=flh)
    time_op("head dX  dy@WT     -> [25536,1024]",
            lambda dy, w: lax.dot_general(
                dy, w, (((1,), (1,)), ((), ()))), dyh, wh, flops=flh)

    # fp32 grad-of-focal chain vs bf16: is the head backward upcast?
    dyh32 = dyh.astype(jnp.float32)
    time_op("head dW  fp32 dy   -> [1024,3806]",
            lambda x, dy: lax.dot_general(
                x.astype(jnp.float32), dy, (((0,), (0,)), ((), ()))),
            xh, dyh32, flops=flh)


def part_attn(iters=20):
    rng = np.random.default_rng(0)
    from tim_tpu.ops.attention import tim_attention
    B, H, S, DH, NCTX = 64, 8, 898, 128, 100
    q = jnp.asarray(rng.normal(size=(B, H, S, DH)) * 0.05, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, S, DH)) * 0.05, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, S, DH)) * 0.05, jnp.bfloat16)

    def fwd(q, k, v):
        return tim_attention(q, k, v, NCTX)

    def fwd_loss(q, k, v):
        return fwd(q, k, v).astype(jnp.float32).sum()

    @jax.jit
    def run_f(q, k, v):
        def body(i, carry):
            return fwd(q + carry * jnp.asarray(1e-9, q.dtype), k,
                       v).astype(jnp.float32).max()
        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    @jax.jit
    def run_g(q, k, v):
        def body(i, carry):
            g = jax.grad(fwd_loss)(
                q + carry * jnp.asarray(1e-9, q.dtype), k, v)
            return g.astype(jnp.float32).max()
        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run_f(q, k, v))
    t0 = time.perf_counter()
    float(run_f(q, k, v))
    tf = (time.perf_counter() - t0) / iters
    float(run_g(q, k, v))
    t0 = time.perf_counter()
    float(run_g(q, k, v))
    tg = (time.perf_counter() - t0) / iters
    print(f"[attn] structured fwd: {tf * 1e3:.2f} ms | fwd+bwd: "
          f"{tg * 1e3:.2f} ms ({tg / tf:.2f}x fwd; ideal ~3x)", flush=True)


if __name__ == "__main__":
    parts = sys.argv[1:] or ["train", "matmul", "attn"]
    print("devices:", jax.devices(), flush=True)
    if "matmul" in parts:
        part_matmul()
    if "attn" in parts:
        part_attn()
    if "train" in parts:
        part_train()
