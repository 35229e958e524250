"""Coarse (uint8-mask) dropout: statistics + model wiring.

``ops/dropout.py`` replaces ``jax.random.bernoulli``'s 32-bit draw with
uint8 bits compared against a 1/256-quantized keep threshold — 4x fewer
generated random bits for the detection train step's dominant non-matmul
cost (docs/PERFORMANCE.md round-3 attribution). Statistically equivalent
dropout, NOT bit-exact with ``nn.Dropout``; gated behind
``ModelConfig.dropout_bits=8``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tim_tpu.ops.dropout import coarse_dropout, dropout


def test_coarse_dropout_unbiased_and_rate():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((512, 512), jnp.float32)
    rate = 0.1
    y = np.asarray(coarse_dropout(key, x, rate))
    keep_q = round((1.0 - rate) * 256.0)  # 230
    # E[y] = keep_prob * scale = (keep_q/256) * (256/keep_q) = 1 exactly
    assert abs(y.mean() - 1.0) < 5e-3
    # empirical drop rate matches the QUANTIZED keep prob, not the raw one
    drop_frac = (y == 0.0).mean()
    assert abs(drop_frac - (1.0 - keep_q / 256.0)) < 5e-3
    # survivors are scaled by exactly 256/keep_q
    survivors = y[y != 0.0]
    np.testing.assert_allclose(survivors, 256.0 / keep_q, rtol=1e-6)


def test_coarse_dropout_edge_rates():
    key = jax.random.PRNGKey(1)
    x = jnp.full((8, 8), 3.0)
    # rate ~0 -> identity (keep_q == 256)
    np.testing.assert_array_equal(np.asarray(coarse_dropout(key, x, 0.001)),
                                  np.asarray(x))
    # rate ~1 -> zeros
    np.testing.assert_array_equal(np.asarray(coarse_dropout(key, x, 0.999)),
                                  np.zeros((8, 8)))


def test_dispatch_matches_bernoulli_semantics():
    key = jax.random.PRNGKey(2)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 64)),
                    jnp.float32)
    # bits=32 reproduces the flax/nn.Dropout formula exactly
    want = jnp.where(jax.random.bernoulli(key, 0.9, x.shape), x / 0.9, 0.0)
    got = dropout(key, x, 0.1, deterministic=False, bits=32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # deterministic -> identity for both widths
    for bits in (8, 32):
        np.testing.assert_array_equal(
            np.asarray(dropout(key, x, 0.1, True, bits)), np.asarray(x))


@pytest.mark.parametrize("task", ["recognition", "detection"])
def test_dropout_bits8_model_path(task):
    """dropout_bits=8 threads through TimRecognition/TimDetection: the
    train-mode forward differs from deterministic (masks applied), grads
    are finite, and eval is identical to the bits=32 model (no dropout
    drawn at eval)."""
    import dataclasses

    from tim_tpu import config as C
    from tim_tpu.models import TimDetection, TimRecognition

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    if task == "recognition":
        cfg = C.ModelConfig(
            visual_classes=(7,), audio_classes=5, visual_input_dim=12,
            audio_input_dim=10, d_model=16, nhead=2, num_layers=2,
            num_feats=4, enc_dropout=0.25)
        model8 = TimRecognition(dataclasses.replace(cfg, dropout_bits=8))
        model32 = TimRecognition(cfg)
        nf = cfg.num_feats
        nq = 2
        times = jnp.asarray(
            rng.uniform(size=(2, 2 * nf + 2 * nq, 2)), jnp.float32)
        args = (jnp.asarray(rng.normal(size=(2, nf, 12)), jnp.float32),
                jnp.asarray(rng.normal(size=(2, nf, 10)), jnp.float32),
                times, nq, nq)
    else:
        cfg = C.DetectionConfig(
            visual_classes=(7,), audio_classes=5, visual_input_dim=12,
            audio_input_dim=10, d_model=16, nhead=2, num_layers=2,
            num_feats=4, enc_dropout=0.25)
        model8 = TimDetection(dataclasses.replace(cfg, dropout_bits=8))
        model32 = TimDetection(cfg)
        nf = cfg.num_feats
        nq = 3
        times = jnp.asarray(
            rng.uniform(size=(2, 2 * nf + 2 * nq, 2)), jnp.float32)
        args = (jnp.asarray(rng.normal(size=(2, nf, 12)), jnp.float32),
                jnp.asarray(rng.normal(size=(2, nf, 10)), jnp.float32),
                times, nq, nq)

    variables = model8.init({"params": key, "dropout": key}, *args,
                            deterministic=True)

    out_det = model8.apply(variables, *args, deterministic=True)
    out_train = model8.apply(variables, *args, deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(3)})
    out32_det = model32.apply(variables, *args, deterministic=True)
    l0_det = jax.tree_util.tree_leaves(out_det)[0]
    l0_train = jax.tree_util.tree_leaves(out_train)[0]
    l0_32 = jax.tree_util.tree_leaves(out32_det)[0]
    # eval path draws no bits -> identical across dropout_bits
    np.testing.assert_array_equal(np.asarray(l0_det), np.asarray(l0_32))
    # train path actually drops
    assert not np.allclose(np.asarray(l0_det), np.asarray(l0_train))

    def loss(params):
        out = model8.apply({"params": params}, *args, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(4)})
        return sum(jnp.sum(leaf.astype(jnp.float32) ** 2)
                   for leaf in jax.tree_util.tree_leaves(out))

    grads = jax.grad(loss)(variables["params"])
    flat = np.concatenate([np.ravel(np.asarray(g, np.float64))
                           for g in jax.tree_util.tree_leaves(grads)])
    assert np.isfinite(flat).all()
    assert np.abs(flat).max() > 0.0
