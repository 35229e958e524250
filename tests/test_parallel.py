"""Sharded training equals single-device training, on a virtual 8-device
CPU mesh (4 data x 2 model)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tim_tpu import config as C
from tim_tpu.models import TimRecognition
from tim_tpu.parallel import (
    make_mesh, param_shardings, shard_batch, shard_train_state)
from tim_tpu.train import recognition as rec_train
from tim_tpu.train.optim import make_optimizer
from tim_tpu.train.state import create_train_state


def _make_batch(cfg, batch, nv, na, seed=0):
    rng = np.random.default_rng(seed)
    nf = cfg.num_feats
    t = 2 * nf + nv + na
    return {
        "v_feats": jnp.asarray(rng.normal(
            size=(batch, nf, cfg.visual_input_dim)), jnp.float32),
        "a_feats": jnp.asarray(rng.normal(
            size=(batch, nf, cfg.audio_input_dim)), jnp.float32),
        "times": jnp.asarray(rng.uniform(size=(batch, t, 2)), jnp.float32),
        "verb": jnp.asarray(rng.integers(-1, 9, size=(batch, nv))),
        "noun": jnp.asarray(rng.integers(-1, 11, size=(batch, nv))),
        "action": jnp.asarray(rng.integers(-1, 13, size=(batch, nv))),
        "class_id": jnp.asarray(rng.integers(-1, 7, size=(batch, na))),
    }


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
@pytest.mark.slow
def test_sharded_step_matches_single_device(mesh_shape):
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    cfg = C.ModelConfig(
        visual_classes=(9, 11, 13), audio_classes=7,
        visual_input_dim=32, audio_input_dim=24, d_model=32, nhead=4,
        num_layers=2, num_feats=8, compute_dtype="float32")
    tcfg = C.TrainConfig(lr=1e-3, mixup_alpha=0.0, lambda_drloc=0.1)
    nv, na = 3, 2
    model = TimRecognition(cfg)
    batch = _make_batch(cfg, 8, nv, na)

    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, batch["v_feats"],
        batch["a_feats"], batch["times"], nv, na, deterministic=True)
    tx = make_optimizer(tcfg.lr, tcfg.weight_decay, 100, 10)

    step = rec_train.make_train_step(model, cfg, tcfg, nv, na)

    # single-device baseline (dropout off for determinism across layouts)
    tcfg0 = tcfg
    state0 = create_train_state(variables["params"], tx)
    s0, m0 = jax.jit(step)(state0, batch, rng)

    # sharded
    mesh = make_mesh(*mesh_shape)
    state = create_train_state(variables["params"], tx)
    state = shard_train_state(state, mesh)
    sharded_batch = shard_batch(batch, mesh)
    s1, m1 = jax.jit(step)(state, sharded_batch, rng)

    assert float(m1["loss"]) == pytest.approx(float(m0["loss"]), rel=1e-4)
    l0 = jax.tree_util.tree_leaves(s0.params)
    l1 = jax.tree_util.tree_leaves(s1.params)
    for a, b in zip(l0, l1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_param_shardings_rules():
    cfg = C.ModelConfig(
        visual_classes=(9, 11, 13), audio_classes=7,
        visual_input_dim=32, audio_input_dim=24, d_model=32, nhead=4,
        num_layers=1, num_feats=8, compute_dtype="float32")
    model = TimRecognition(cfg)
    batch = _make_batch(cfg, 2, 3, 2)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, batch["v_feats"],
        batch["a_feats"], batch["times"], 3, 2, deterministic=True)
    mesh = make_mesh(4, 2)
    sh = param_shardings(variables["params"], mesh)

    def spec(*path):
        node = sh
        for p in path:
            node = node[p]
        return tuple(node.spec)

    assert spec("encoder", "layer0", "self_attn", "q", "kernel") == \
        (None, "model")
    assert spec("encoder", "layer0", "self_attn", "out", "kernel") == \
        ("model",)
    assert spec("encoder", "layer0", "linear1", "kernel") == (None, "model")
    assert spec("encoder", "layer0", "linear2", "kernel") == ("model",)
    # 13 classes don't divide over model=2 -> falls back to replicated
    assert spec("cls_head", "fc_action", "kernel") == ()
    assert spec("time_mlp", "fc0", "kernel") == ()


def test_param_shardings_shards_divisible_heads():
    cfg = C.ModelConfig(
        visual_classes=(16, 32, 64), audio_classes=8,
        visual_input_dim=32, audio_input_dim=24, d_model=32, nhead=4,
        num_layers=1, num_feats=8, compute_dtype="float32")
    model = TimRecognition(cfg)
    batch = _make_batch(cfg, 2, 3, 2)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, batch["v_feats"],
        batch["a_feats"], batch["times"], 3, 2, deterministic=True)
    mesh = make_mesh(4, 2)
    sh = param_shardings(variables["params"], mesh)
    assert tuple(sh["cls_head"]["fc_action"]["kernel"].spec) == \
        (None, "model")


@pytest.mark.slow
def test_sequence_parallel_step_matches_single_device():
    """dp x tp x SP: token-axis sharding constraints in the encoder's
    post-LN regions (cfg.sequence_parallel) leave the training step
    bit-comparable to the unsharded baseline."""
    assert len(jax.devices()) >= 8
    cfg = C.ModelConfig(
        visual_classes=(9, 11, 13), audio_classes=7,
        visual_input_dim=32, audio_input_dim=24, d_model=32, nhead=4,
        num_layers=2, num_feats=8, compute_dtype="float32")
    tcfg = C.TrainConfig(lr=1e-3, mixup_alpha=0.0, lambda_drloc=0.1)
    # S = 2*8 + 3*2 + 2 = 24 — divisible by model=2, so the token axis
    # genuinely shards (27 would silently stay replicated)
    nv, na = 2, 2
    batch = _make_batch(cfg, 8, nv, na)

    model = TimRecognition(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, batch["v_feats"],
        batch["a_feats"], batch["times"], nv, na, deterministic=True)
    tx = make_optimizer(tcfg.lr, tcfg.weight_decay, 100, 10)
    step0 = rec_train.make_train_step(model, cfg, tcfg, nv, na)
    state0 = create_train_state(variables["params"], tx)
    s0, m0 = jax.jit(step0)(state0, batch, rng)

    import dataclasses
    sp_cfg = dataclasses.replace(cfg, sequence_parallel=True)
    sp_model = TimRecognition(sp_cfg)
    sp_step = rec_train.make_train_step(sp_model, sp_cfg, tcfg, nv, na)
    mesh = make_mesh(4, 2)
    prev = getattr(jax.sharding, "get_mesh", lambda: None)()
    jax.set_mesh(mesh)
    try:
        state = create_train_state(variables["params"], tx)
        state = shard_train_state(state, mesh)
        sharded_batch = shard_batch(batch, mesh)
        s1, m1 = jax.jit(sp_step)(state, sharded_batch, rng)
    finally:
        if prev is not None:
            jax.set_mesh(prev)
    assert float(m1["loss"]) == pytest.approx(float(m0["loss"]), rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_put_ids_sharding_and_values():
    """put_ids places identical host ids as a global array: batch axis
    sharded over 'data' when divisible, fully replicated otherwise;
    values round-trip exactly either way (runner/recognition.py bank
    paths feed these into jit steps — multihost parity is covered by
    tests/test_multihost.py bank mode)."""
    from jax.sharding import PartitionSpec as P

    from tim_tpu.parallel.mesh import put_ids

    mesh = make_mesh(4, 2)
    ids = np.arange(8, dtype=np.int32)
    g = put_ids(ids, mesh)
    assert g.sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(g), ids)

    odd = np.arange(7, dtype=np.int32)
    r = put_ids(odd, mesh)
    assert r.sharding.spec == P(None)
    np.testing.assert_array_equal(np.asarray(r), odd)

    mat = np.arange(24, dtype=np.int32).reshape(3, 8)
    m = put_ids(mat, mesh, batch_axis=1)
    assert m.sharding.spec == P(None, "data")
    np.testing.assert_array_equal(np.asarray(m), mat)

    # jit consumers see the same values under the mesh
    out = jax.jit(lambda x: x * 2 + 1)(g)
    np.testing.assert_array_equal(np.asarray(out), ids * 2 + 1)
