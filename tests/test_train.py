"""Train-step integration: jit compiles, losses decrease on a tiny
synthetic overfit, normaliser EMA behaves, checkpoint roundtrips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tim_tpu import config as C
from tim_tpu.data import synthetic
from tim_tpu.data.dataset import (
    DetectionDataset, FeatureStore, RecognitionDataset, batch_iterator)
from tim_tpu.data.windows import (
    build_detection_windows, build_recognition_windows, normalize_actions)
from tim_tpu.models import TimDetection, TimRecognition
from tim_tpu.train import checkpoint as ckpt
from tim_tpu.train import detection as det_train
from tim_tpu.train import recognition as rec_train
from tim_tpu.train.optim import make_optimizer
from tim_tpu.train.state import create_train_state, training_rng


@pytest.fixture(scope="module")
def bundle():
    return synthetic.synthetic_epic(
        seed=0, num_videos=2, video_seconds=40.0, per_video=8,
        visual_dim=32, audio_dim=24)


def _recognition_setup(bundle, num_feats=8):
    v_norm = normalize_actions(bundle["v_actions"], "visual")
    a_norm = normalize_actions(bundle["a_actions"], "audio")
    ws = build_recognition_windows(
        v_norm, a_norm, bundle["video_info"], bundle["v_feat_times"],
        num_feats=num_feats, feat_stride=2, feat_gap=0.2)
    v_store = FeatureStore(bundle["v_feats"], bundle["v_feat_times"])
    a_store = FeatureStore(bundle["a_feats"], bundle["a_feat_times"])
    ds = RecognitionDataset(ws, v_store, a_store)
    cfg = C.ModelConfig(
        visual_classes=(9, 11, 13), audio_classes=7,
        visual_input_dim=32, audio_input_dim=24, d_model=32, nhead=4,
        num_layers=2, num_feats=num_feats, compute_dtype="float32")
    return ws, ds, cfg


@pytest.mark.slow
def test_recognition_overfit(bundle):
    ws, ds, cfg = _recognition_setup(bundle)
    tcfg = C.TrainConfig(batch_size=4, lr=3e-4, mixup_alpha=0.0,
                         lambda_drloc=0.1, label_smoothing=0.2)
    model = TimRecognition(cfg)
    nv, na = ws.max_visual_actions, ws.max_audio_actions

    batch = next(batch_iterator(ds, 8, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, batch["v_feats"],
        batch["a_feats"], batch["times"], nv, na, deterministic=True)

    tx = make_optimizer(tcfg.lr, tcfg.weight_decay, total_steps=300,
                        warmup_steps=10)
    state = create_train_state(variables["params"], tx)
    step = jax.jit(rec_train.make_train_step(model, cfg, tcfg, nv, na))

    losses = []
    for i in range(60):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[::10]

    # eval step emits logits with the right shapes + finite losses
    eval_step = jax.jit(rec_train.make_eval_step(model, cfg, tcfg, nv, na))
    logits, eval_losses = eval_step(state.params, batch)
    assert logits["action"].shape == (8, nv, 13)
    assert logits["audio"].shape == (8, na, 7)
    assert all(np.isfinite(float(v)) for v in eval_losses.values())


@pytest.mark.slow
def test_training_rng_rbg_path(bundle):
    """TrainConfig.rng_impl='rbg' (the default, TPU hardware RNG for
    dropout bits — scripts/bench_bwd_micro.py measured 208->245 win/s
    detection train): the rbg key drives the train step to the same
    finite, decreasing losses, deterministically per key, and the
    dropout draws are genuinely stochastic across steps."""
    ws, ds, cfg = _recognition_setup(bundle)
    tcfg = C.TrainConfig(batch_size=4, lr=3e-4, mixup_alpha=0.2,
                         lambda_drloc=0.1)
    assert tcfg.rng_impl == "rbg"
    model = TimRecognition(cfg)
    nv, na = ws.max_visual_actions, ws.max_audio_actions
    batch = next(batch_iterator(ds, 8, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    init_rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": init_rng, "dropout": init_rng}, batch["v_feats"],
        batch["a_feats"], batch["times"], nv, na, deterministic=True)
    tx = make_optimizer(tcfg.lr, tcfg.weight_decay, total_steps=300,
                        warmup_steps=10)
    state = create_train_state(variables["params"], tx)
    step = jax.jit(rec_train.make_train_step(model, cfg, tcfg, nv, na))

    rng = training_rng(tcfg.seed, tcfg.rng_impl)
    losses = []
    st = state
    for _ in range(30):
        st, metrics = step(st, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # same key -> bit-identical first step (determinism preserved)
    _, m1 = step(state, batch, rng)
    _, m2 = step(state, batch, rng)
    assert float(m1["loss"]) == float(m2["loss"])

    # the step folds in state.step, so consecutive steps draw different
    # dropout masks: same params, same batch, different loss
    st1, ma = step(state, batch, rng)
    st1 = st1.replace(params=state.params, opt_state=state.opt_state)
    _, mb = step(st1, batch, rng)
    assert float(ma["loss"]) != float(mb["loss"])


@pytest.mark.slow
def test_recognition_checkpoint_roundtrip(bundle, tmp_path):
    ws, ds, cfg = _recognition_setup(bundle)
    tcfg = C.TrainConfig()
    model = TimRecognition(cfg)
    nv, na = ws.max_visual_actions, ws.max_audio_actions
    batch = next(batch_iterator(ds, 4, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(1)
    variables = model.init(
        {"params": rng, "dropout": rng}, batch["v_feats"],
        batch["a_feats"], batch["times"], nv, na, deterministic=True)
    tx = make_optimizer(1e-4, 1e-4, 100, 10)
    state = create_train_state(variables["params"], tx)
    step = jax.jit(rec_train.make_train_step(model, cfg, tcfg, nv, na))
    state, _ = step(state, batch, rng)

    ckpt.save_checkpoint(str(tmp_path), state, epoch=1, is_best="visual")
    payload = ckpt.load_checkpoint(str(tmp_path))
    assert payload["epoch"] == 1
    state2 = ckpt.restore_train_state(
        create_train_state(variables["params"], tx), payload)
    assert int(state2.step) == int(state.step)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(state2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert (tmp_path / "best_visual.msgpack").exists()


def test_shape_matched_merge_logs_and_merges():
    init = {"a": np.zeros((2, 2)), "b": {"c": np.zeros(3)}}
    loaded = {"a": np.ones((2, 2)), "b": {"c": np.ones(4)}, "d": np.ones(1)}
    merged = ckpt.shape_matched_merge(init, loaded)
    np.testing.assert_array_equal(merged["a"], np.ones((2, 2)))
    np.testing.assert_array_equal(merged["b"]["c"], np.zeros(3))


@pytest.mark.slow
def test_detection_overfit(bundle):
    num_feats = 8
    window_size = num_feats * 2 * 0.2
    v_norm = normalize_actions(bundle["v_actions"], "visual",
                               detection=True, window_size=window_size)
    a_norm = normalize_actions(bundle["a_actions"], "audio",
                               detection=True, window_size=window_size)
    ws = build_detection_windows(
        v_norm, a_norm, bundle["video_info"], bundle["v_feat_times"],
        num_feats=num_feats, feat_stride=2, feat_gap=0.2)
    v_store = FeatureStore(bundle["v_feats"], bundle["v_feat_times"])
    a_store = FeatureStore(bundle["a_feats"], bundle["a_feat_times"])
    ds = DetectionDataset(ws, v_store, a_store, include_verb_noun=False,
                          dataset_name="synthetic")

    cfg = C.DetectionConfig(
        visual_classes=(13,), audio_classes=7,
        visual_input_dim=32, audio_input_dim=24, d_model=32, nhead=4,
        num_layers=2, num_feats=num_feats, compute_dtype="float32",
        train_query_size=0.04, inference_query_size=0.08)
    # momentum 1.0 freezes the normaliser EMA so the loss trend reflects
    # learning (with the reference's decaying EMA the reported loss rises
    # early by construction as the divisor shrinks toward num_pos).
    tcfg = C.TrainConfig(lr=3e-4, lambda_drloc=0.1, normaliser_init=20.0,
                         normaliser_momentum=1.0)
    model = TimDetection(cfg)

    batch = next(batch_iterator(ds, 8, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    from tim_tpu.models.queries import generate_query_pyramid
    nq = generate_query_pyramid(cfg.inference_query_size).shape[0]
    rng = jax.random.PRNGKey(0)
    t_dummy = jnp.zeros((8, batch["times"].shape[1] + 2 * nq, 2))
    variables = model.init(
        {"params": rng, "dropout": rng}, batch["v_feats"],
        batch["a_feats"], t_dummy, nq, nq, deterministic=True)

    tx = make_optimizer(tcfg.lr, 0.05, total_steps=300, warmup_steps=10)
    state = create_train_state(variables["params"], tx,
                               normaliser=tcfg.normaliser_init)
    step = jax.jit(det_train.make_train_step(model, cfg, tcfg))

    losses = []
    for i in range(40):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses[::10]

    # With real momentum the EMA moves from its init toward num_pos
    # (``detection/scripts/train.py:232``).
    tcfg_ema = C.TrainConfig(lr=3e-4, lambda_drloc=0.0,
                             normaliser_init=20.0, normaliser_momentum=0.9)
    step_ema = jax.jit(det_train.make_train_step(model, cfg, tcfg_ema))
    state_ema = create_train_state(variables["params"], tx,
                                   normaliser=tcfg_ema.normaliser_init)
    state_ema, m = step_ema(state_ema, batch, rng)
    assert float(state_ema.normaliser) < tcfg_ema.normaliser_init

    infer = jax.jit(det_train.make_inference_step(model, cfg))
    out = infer(state.params, batch)
    assert out["v_scores"].shape == (8, nq, 13)
    assert out["a_scores"].shape == (8, nq, 7)
    assert out["v_proposals"].shape == (8, nq, 2)
    # proposals live in video time within the window bounds
    ws_start = np.asarray(batch["window_start"])
    assert (np.asarray(out["v_proposals"]) >=
            ws_start[:, None, None] - 1e-5).all()


def test_shared_queries_layer0_exact():
    """shared_queries=True (project one query row, broadcast) must equal
    the plain forward when query tokens are batch-identical."""
    from tim_tpu.models.queries import generate_query_pyramid
    from tim_tpu.models import TimDetection

    cfg = C.DetectionConfig(
        visual_classes=(5,), audio_classes=3,
        visual_input_dim=16, audio_input_dim=12, d_model=16, nhead=2,
        num_layers=2, num_feats=6, compute_dtype="float32",
        inference_query_size=0.2)
    model = TimDetection(cfg)
    nq = generate_query_pyramid(cfg.inference_query_size).shape[0]
    rng = jax.random.PRNGKey(0)
    rnd = np.random.default_rng(0)
    b = 3
    v = jnp.asarray(rnd.normal(size=(b, 6, 16)), jnp.float32)
    a = jnp.asarray(rnd.normal(size=(b, 6, 12)), jnp.float32)
    feat_times = jnp.asarray(rnd.uniform(size=(b, 12, 2)), jnp.float32)
    grid = jnp.asarray(generate_query_pyramid(cfg.inference_query_size))
    queries = jnp.broadcast_to(grid[None], (b, nq, 2))
    times = jnp.concatenate([feat_times, queries, queries], axis=1)

    variables = model.init({"params": rng, "dropout": rng}, v, a, times,
                           nq, nq, deterministic=True)
    te = model.apply(variables, times, method=TimDetection.encode_times)
    plain = model.apply(variables, v, a, te, nq, nq, deterministic=True,
                        method=TimDetection.encoder_forward)
    shared = model.apply(variables, v, a, te, nq, nq, deterministic=True,
                         shared_queries=True,
                         method=TimDetection.encoder_forward)
    # equal up to matmul association order (different blocking for the
    # [1, C] row vs the batched projection)
    np.testing.assert_allclose(np.asarray(plain[0][2]),
                               np.asarray(shared[0][2]),
                               atol=1e-5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(plain[1][0]),
                               np.asarray(shared[1][0]),
                               atol=1e-5, rtol=1e-6)


def test_query_pyramid_matches_reference_semantics():
    """Pyramid equals the torch construction in detection tim.py:144-155."""
    torch = pytest.importorskip("torch")
    from tim_tpu.models.queries import generate_query_pyramid

    for qs in (0.005, 0.01, 0.04):
        queries = []
        size = qs
        while size < 1.0:
            st = torch.arange(0.0, 1.0, step=size / 2)
            layer = torch.round(torch.stack([st, st + size], dim=-1),
                                decimals=3)
            queries.append(layer)
            size *= 2
        want = torch.concat(queries, dim=0).numpy()
        got = generate_query_pyramid(qs)
        assert got.shape == want.shape
        # the 0.005 train pool can differ by 0.001 at rounding boundaries
        # (1-ulp torch-vs-numpy arange divergence); inference grids
        # (>= 0.01) must be exact
        atol = 1.1e-3 if qs < 0.01 else 1e-6
        np.testing.assert_allclose(got, want, atol=atol)
        if qs >= 0.01:
            np.testing.assert_array_equal(got, want)


def test_label_queries_matches_bruteforce():
    rng = np.random.default_rng(0)
    b, nq, na = 3, 16, 4
    queries = np.sort(rng.uniform(0, 1, (b, nq, 2)), axis=-1).astype(
        np.float32)
    gt = np.sort(rng.uniform(0, 1, (b, na, 2)), axis=-1).astype(np.float32)
    labels = rng.integers(0, 5, (b, na, 1)).astype(np.int64)

    from tim_tpu.models.queries import label_queries
    t, l, i = label_queries(
        jnp.asarray(queries), jnp.asarray(gt), jnp.asarray(labels), 0.3)

    for bi in range(b):
        for qi in range(nq):
            ious = []
            for ai in range(na):
                s = max(queries[bi, qi, 0], gt[bi, ai, 0])
                e = min(queries[bi, qi, 1], gt[bi, ai, 1])
                inter = max(0.0, e - s)
                union = ((gt[bi, ai, 1] - gt[bi, ai, 0])
                         + (queries[bi, qi, 1] - queries[bi, qi, 0]) - inter)
                ious.append(inter / union)
            best = int(np.argmax(ious))
            assert float(i[bi, qi]) == pytest.approx(ious[best], abs=1e-5)
            if ious[best] >= 0.3:
                np.testing.assert_allclose(np.asarray(t[bi, qi]),
                                           gt[bi, best], atol=1e-6)
                assert int(l[bi, qi, 0]) == labels[bi, best, 0]
            else:
                assert not np.isfinite(np.asarray(t[bi, qi])).any()
                assert int(l[bi, qi, 0]) == -1


def test_orbax_checkpoint_roundtrip_and_sharded_restore(tmp_path):
    """Orbax backend: save (sync + async), latest-epoch restore equals
    the saved state, and restore-direct-to-sharding places params on the
    mesh without a host-replicated intermediate."""
    import jax
    import jax.numpy as jnp

    from tim_tpu.parallel import make_mesh, param_shardings
    from tim_tpu.train import checkpoint as ckpt
    from tim_tpu.train.optim import make_optimizer
    from tim_tpu.train.state import create_train_state

    params = {"dense": {"kernel": np.arange(32, dtype=np.float32)
                        .reshape(4, 8),
                        "bias": np.zeros(8, np.float32)}}
    tx = make_optimizer(1e-3, 1e-4, 10, 2)
    state = create_train_state(
        jax.tree_util.tree_map(jnp.asarray, params), tx, normaliser=5.0)

    # save params while SHARDED on the mesh (the orbax path hands
    # jax.Arrays straight through — no host-unsharded copies)
    mesh0 = make_mesh(8, 1)
    from tim_tpu.parallel import shard_train_state
    state = shard_train_state(state, mesh0)
    ckpt.save_checkpoint_orbax(str(tmp_path), state, epoch=1)
    c = ckpt.save_checkpoint_orbax(str(tmp_path), state, epoch=2,
                                   wait=False)
    # reusing the returned checkpointer serializes consecutive saves
    c = ckpt.save_checkpoint_orbax(str(tmp_path), state, epoch=3,
                                   wait=False, ckptr=c)
    c.wait_until_finished()

    payload = ckpt.load_checkpoint_orbax(str(tmp_path))   # latest == 3
    assert int(payload["epoch"]) == 3
    np.testing.assert_array_equal(payload["params"]["dense"]["kernel"],
                                  params["dense"]["kernel"])

    # sharded restore: params land directly on the mesh
    mesh = make_mesh(8, 1)
    sh = param_shardings(params, mesh)
    restored = ckpt.load_checkpoint_orbax(str(tmp_path), epoch=1,
                                          params_shardings=sh)["params"]
    np.testing.assert_array_equal(
        np.asarray(restored["dense"]["kernel"]),
        params["dense"]["kernel"])
    assert restored["dense"]["kernel"].sharding.mesh.shape["data"] == 8


def test_load_checkpoint_orbax_fallback(tmp_path):
    """``load_checkpoint`` on an output dir that only has orbax
    checkpoints (cross-host-sharded runs route saves there) falls back
    to the newest orbax epoch, so --resume/--pretrained_model work on
    such dirs."""
    import os

    import jax
    import jax.numpy as jnp

    from tim_tpu.train import checkpoint as ckpt
    from tim_tpu.train.optim import make_optimizer
    from tim_tpu.train.state import create_train_state

    params = {"w": np.arange(12, dtype=np.float32).reshape(3, 4)}
    tx = make_optimizer(1e-3, 1e-4, 10, 2)
    state = create_train_state(
        jax.tree_util.tree_map(jnp.asarray, params), tx, normaliser=2.0)
    ckpt.save_checkpoint_orbax(str(tmp_path), state, epoch=4)
    assert not os.path.exists(tmp_path / "checkpoint.msgpack")

    payload = ckpt.load_checkpoint(str(tmp_path))
    assert int(payload["epoch"]) == 4
    np.testing.assert_array_equal(np.asarray(payload["params"]["w"]),
                                  params["w"])

    # explicit .msgpack paths never fall back
    with pytest.raises(FileNotFoundError):
        ckpt.load_checkpoint(str(tmp_path / "nope.msgpack"))
