"""On-device window gather == host dataset assembly."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tim_tpu.data import synthetic
from tim_tpu.data.dataset import FeatureStore, RecognitionDataset
from tim_tpu.data.device_bank import (
    DeviceFeatureBank, gather_window_batch, window_index_table)
from tim_tpu.data.windows import build_recognition_windows, normalize_actions


def test_device_gather_matches_host_dataset():
    b = synthetic.synthetic_epic(seed=1, num_videos=2, video_seconds=40.0,
                                 per_video=6, visual_dim=16, audio_dim=12)
    v_norm = normalize_actions(b["v_actions"], "visual")
    a_norm = normalize_actions(b["a_actions"], "audio")
    ws = build_recognition_windows(
        v_norm, a_norm, b["video_info"], b["v_feat_times"],
        num_feats=6, feat_stride=2, feat_gap=0.2)

    v_store = FeatureStore(b["v_feats"], b["v_feat_times"])
    a_store = FeatureStore(b["a_feats"], b["a_feat_times"])
    ds = RecognitionDataset(ws, v_store, a_store,
                            sample_augmentations=False)

    v_bank = DeviceFeatureBank(b["v_feats"])
    a_bank = DeviceFeatureBank(b["a_feats"])
    table = window_index_table(ws, v_bank)
    assert table.shape == (len(ws.windows), 6)

    idx = jnp.asarray(table[:4])
    v, a = gather_window_batch(v_bank, a_bank, idx, rng=None)
    for i in range(4):
        host = ds[i]
        np.testing.assert_allclose(np.asarray(v[i]), host["v_feats"],
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(a[i]), host["a_feats"],
                                   atol=1e-6)


@pytest.mark.slow
def test_bank_train_step_matches_host_step():
    from tim_tpu import config as C
    from tim_tpu.models import TimRecognition
    from tim_tpu.train import recognition as rec_train
    from tim_tpu.train.optim import make_optimizer
    from tim_tpu.train.state import create_train_state

    b = synthetic.synthetic_epic(seed=2, num_videos=2, video_seconds=40.0,
                                 per_video=6, visual_dim=16, audio_dim=12,
                                 visual_classes=(5, 6, 4), audio_classes=3)
    # single augmentation set so the two paths see identical features
    v_feats = {k: v[:, :1] for k, v in b["v_feats"].items()}
    a_feats = {k: v[:, :1] for k, v in b["a_feats"].items()}
    v_norm = normalize_actions(b["v_actions"], "visual")
    a_norm = normalize_actions(b["a_actions"], "audio")
    ws = build_recognition_windows(
        v_norm, a_norm, b["video_info"], b["v_feat_times"],
        num_feats=6, feat_stride=2, feat_gap=0.2)

    cfg = C.ModelConfig(
        visual_classes=(5, 6, 4), audio_classes=3,
        visual_input_dim=16, audio_input_dim=12, d_model=16, nhead=2,
        num_layers=1, num_feats=6, compute_dtype="float32")
    tcfg = C.TrainConfig(mixup_alpha=0.0, lambda_drloc=0.0)
    model = TimRecognition(cfg)
    nv, na = ws.max_visual_actions, ws.max_audio_actions

    v_store = FeatureStore(v_feats, b["v_feat_times"])
    a_store = FeatureStore(a_feats, b["a_feat_times"])
    ds = RecognitionDataset(ws, v_store, a_store,
                            sample_augmentations=False)
    from tim_tpu.data.dataset import batch_iterator
    host_batch = next(batch_iterator(ds, 4, shuffle=False))
    host_batch = {k: jnp.asarray(v) for k, v in host_batch.items()
                  if k not in ("v_action_ids", "a_action_ids")}

    v_bank = DeviceFeatureBank(v_feats)
    a_bank = DeviceFeatureBank(a_feats)
    table = window_index_table(ws, v_bank)
    bank_batch = {k: v for k, v in host_batch.items()
                  if k not in ("v_feats", "a_feats")}
    bank_batch["feat_indices"] = jnp.asarray(table[:4])

    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, host_batch["v_feats"],
        host_batch["a_feats"], host_batch["times"], nv, na,
        deterministic=True)
    tx = make_optimizer(1e-3, 1e-4, 10, 2)

    s0 = create_train_state(variables["params"], tx)
    host_step = jax.jit(rec_train.make_train_step(model, cfg, tcfg, nv, na))
    _, m0 = host_step(s0, host_batch, rng)

    s1 = create_train_state(variables["params"], tx)
    bank_step = jax.jit(rec_train.make_bank_train_step(
        model, cfg, tcfg, nv, na, v_bank, a_bank))
    _, m1 = bank_step(s1, bank_batch, rng)

    assert float(m0["loss"]) == float(m1["loss"])


def test_device_window_tables_match_host_dataset():
    from tim_tpu.data.device_bank import DeviceWindowTables

    b = synthetic.synthetic_epic(seed=3, num_videos=2, video_seconds=40.0,
                                 per_video=6, visual_dim=16, audio_dim=12,
                                 visual_classes=(5, 6, 4), audio_classes=3)
    v_feats = {k: v[:, :1] for k, v in b["v_feats"].items()}
    a_feats = {k: v[:, :1] for k, v in b["a_feats"].items()}
    v_norm = normalize_actions(b["v_actions"], "visual")
    a_norm = normalize_actions(b["a_actions"], "audio")
    ws = build_recognition_windows(
        v_norm, a_norm, b["video_info"], b["v_feat_times"],
        num_feats=6, feat_stride=2, feat_gap=0.2)

    v_bank = DeviceFeatureBank(v_feats)
    a_bank = DeviceFeatureBank(a_feats)
    tables = DeviceWindowTables(ws, v_bank, a_bank,
                                b["v_feat_times"], b["a_feat_times"])

    ds = RecognitionDataset(
        ws, FeatureStore(v_feats, b["v_feat_times"]),
        FeatureStore(a_feats, b["a_feat_times"]),
        sample_augmentations=False)

    ids = jnp.asarray([0, len(ws.windows) // 2, len(ws.windows) - 1])
    batch = jax.jit(tables.batch)(ids)
    for j, i in enumerate(np.asarray(ids)):
        host = ds[int(i)]
        np.testing.assert_allclose(np.asarray(batch["times"][j]),
                                   host["times"], atol=1e-6)
        for key in ("verb", "noun", "action", "class_id"):
            np.testing.assert_array_equal(np.asarray(batch[key][j]),
                                          host[key])
        v, a = gather_window_batch(v_bank, a_bank,
                                   batch["feat_indices"][j:j + 1], None)
        np.testing.assert_allclose(np.asarray(v[0]), host["v_feats"],
                                   atol=1e-6)


def test_device_gather_aug_sampling_under_jit():
    feats = {"v": np.arange(5 * 3 * 4, dtype=np.float32).reshape(5, 3, 4)}
    bank = DeviceFeatureBank(feats)

    @jax.jit
    def step(idx, rng):
        v, _ = gather_window_batch(bank, None, idx, rng=rng)
        return v

    idx = jnp.asarray([[0, 2], [1, 4]], jnp.int32)
    out = np.asarray(step(idx, jax.random.PRNGKey(0)))
    assert out.shape == (2, 2, 4)
    # each gathered row equals one of the augmentation sets of that index
    for bi in range(2):
        for fi in range(2):
            row = out[bi, fi]
            cands = feats["v"][int(idx[bi, fi])]
            assert any(np.allclose(row, c) for c in cands)


def test_detection_bank_val_and_extract_match_host():
    """Bank-backed validation losses and dense extraction must match the
    host-assembly paths exactly (single augmentation set)."""
    from tim_tpu import config as C
    from tim_tpu.data.dataset import DetectionDataset
    from tim_tpu.data.windows import build_detection_windows
    from tim_tpu.runner import DetectionRunner

    b = synthetic.synthetic_epic(seed=5, num_videos=2, video_seconds=40.0,
                                 per_video=6, visual_dim=16, audio_dim=12,
                                 visual_classes=(4,), audio_classes=3)
    num_feats = 6
    window_size = num_feats * 2 * 0.2
    v_norm = normalize_actions(b["v_actions"], "visual", detection=True,
                               window_size=window_size)
    a_norm = normalize_actions(b["a_actions"], "audio", detection=True,
                               window_size=window_size)
    ws = build_detection_windows(
        v_norm, a_norm, b["video_info"], b["v_feat_times"],
        num_feats=num_feats, feat_stride=2, feat_gap=0.2)
    v1 = {k: v[:, :1] for k, v in b["v_feats"].items()}
    a1 = {k: v[:, :1] for k, v in b["a_feats"].items()}
    v_store = FeatureStore(v1, b["v_feat_times"])
    a_store = FeatureStore(a1, b["a_feat_times"])
    ds = DetectionDataset(ws, v_store, a_store, sample_augmentations=False,
                          include_verb_noun=False,
                          dataset_name="synthetic")
    cfg = C.DetectionConfig(
        visual_classes=(4,), audio_classes=3,
        visual_input_dim=16, audio_input_dim=12, d_model=16, nhead=2,
        num_layers=1, num_feats=num_feats, compute_dtype="float32",
        train_query_size=0.1, inference_query_size=0.2)
    tcfg = C.TrainConfig(batch_size=4, lambda_drloc=0.0)

    host = DetectionRunner(cfg, tcfg, ds, ds,
                           mesh_cfg=C.MeshConfig(data=1))
    host.init_state()
    banked = DetectionRunner(cfg, tcfg, ds, ds,
                             mesh_cfg=C.MeshConfig(data=1),
                             use_device_bank=True)
    banked.init_state()
    banked.state = banked.state.replace(params=host.state.params)

    # validation losses agree
    sv = host.validate()
    sb = banked.validate()
    for k in sv:
        np.testing.assert_allclose(sb[k], sv[k], rtol=1e-5,
                                   err_msg=f"val stat {k}")

    # dense extraction agrees
    dh = host.extract_dense_predictions()
    db = banked.extract_dense_predictions()
    assert list(dh["video_ids"]) == list(db["video_ids"])
    for k in dh:
        if k == "video_ids":
            continue
        np.testing.assert_allclose(db[k], dh[k], atol=1e-5,
                                   err_msg=f"dump key {k}")


def test_recognition_bank_validate_and_extract_match_host():
    """Bank-backed recognition validation stats and prediction extraction
    must match the host-assembly paths exactly (single aug set)."""
    from tim_tpu import config as C
    from tim_tpu.runner import RecognitionRunner

    b = synthetic.synthetic_epic(seed=9, num_videos=2, video_seconds=40.0,
                                 per_video=6, visual_dim=16, audio_dim=12,
                                 visual_classes=(5, 6, 4), audio_classes=3)
    v1 = {k: v[:, :1] for k, v in b["v_feats"].items()}
    a1 = {k: v[:, :1] for k, v in b["a_feats"].items()}
    v_norm = normalize_actions(b["v_actions"], "visual")
    a_norm = normalize_actions(b["a_actions"], "audio")
    ws = build_recognition_windows(
        v_norm, a_norm, b["video_info"], b["v_feat_times"],
        num_feats=6, feat_stride=2, feat_gap=0.2)
    v_store = FeatureStore(v1, b["v_feat_times"])
    a_store = FeatureStore(a1, b["a_feat_times"])
    ds = RecognitionDataset(ws, v_store, a_store,
                            sample_augmentations=False)
    cfg = C.ModelConfig(
        visual_classes=(5, 6, 4), audio_classes=3,
        visual_input_dim=16, audio_input_dim=12, d_model=16, nhead=2,
        num_layers=1, num_feats=6, compute_dtype="float32")
    tcfg = C.TrainConfig(batch_size=4, mixup_alpha=0.0, lambda_drloc=0.0)

    host = RecognitionRunner(cfg, tcfg, ds, ds,
                             mesh_cfg=C.MeshConfig(data=1))
    host.init_state()
    banked = RecognitionRunner(cfg, tcfg, ds, ds,
                               mesh_cfg=C.MeshConfig(data=1),
                               use_device_bank=True)
    banked.init_state()
    banked.state = banked.state.replace(params=host.state.params)

    sv = host.validate()
    sb = banked.validate()
    assert set(sv) == set(sb)
    for k in sv:
        np.testing.assert_allclose(sb[k], sv[k], rtol=1e-5,
                                   err_msg=f"val stat {k}")

    ph = host.extract_predictions()
    pb = banked.extract_predictions()
    assert set(ph) == set(pb)
    for k in ph:
        if k.endswith("narration_ids"):
            assert ph[k] == pb[k], k
        else:
            np.testing.assert_allclose(pb[k], ph[k], atol=1e-5,
                                       err_msg=f"pred key {k}")


def test_bank_validate_asymmetric_modality():
    """input_modality='audio' + data_modality='audio_visual' (visual
    queries answered from audio features): vote metadata must gate on
    data_modality, not feature-store presence — bank val == host val."""
    from tim_tpu import config as C
    from tim_tpu.runner import RecognitionRunner

    b = synthetic.synthetic_epic(seed=9, num_videos=2, video_seconds=40.0,
                                 per_video=6, visual_dim=16, audio_dim=12,
                                 visual_classes=(5, 6, 4), audio_classes=3)
    a1 = {k: v[:, :1] for k, v in b["a_feats"].items()}
    v_norm = normalize_actions(b["v_actions"], "visual")
    a_norm = normalize_actions(b["a_actions"], "audio")
    ws = build_recognition_windows(
        v_norm, a_norm, b["video_info"], b["v_feat_times"],
        num_feats=6, feat_stride=2, feat_gap=0.2)
    ds = RecognitionDataset(ws, None, FeatureStore(a1, b["a_feat_times"]),
                            sample_augmentations=False)
    cfg = C.ModelConfig(
        visual_classes=(5, 6, 4), audio_classes=3,
        visual_input_dim=16, audio_input_dim=12, d_model=16, nhead=2,
        num_layers=1, num_feats=6, compute_dtype="float32",
        input_modality="audio", data_modality="audio_visual")
    tcfg = C.TrainConfig(batch_size=4, mixup_alpha=0.0, lambda_drloc=0.0)

    host = RecognitionRunner(cfg, tcfg, ds, ds,
                             mesh_cfg=C.MeshConfig(data=1))
    host.init_state()
    banked = RecognitionRunner(cfg, tcfg, ds, ds,
                               mesh_cfg=C.MeshConfig(data=1),
                               use_device_bank=True)
    banked.init_state()
    banked.state = banked.state.replace(params=host.state.params)
    sv, sb = host.validate(), banked.validate()
    assert set(sv) == set(sb)
    # the visual heads must actually vote (the pre-fix bug left them 0)
    assert sv["action_top5"] > 0
    for k in sv:
        np.testing.assert_allclose(sb[k], sv[k], rtol=1e-5, err_msg=k)


def test_topk_extraction_matches_dense():
    """top_k dense dumps: with k == C the thresholded candidate sets and
    the full mAP chain match the dense dump exactly (host and bank
    paths); small k yields a subset."""
    from tim_tpu import config as C
    from tim_tpu.data.dataset import DetectionDataset
    from tim_tpu.data.windows import build_detection_windows
    from tim_tpu.evals.format_predictions import (
        evaluate_detections, threshold_predictions,
        threshold_predictions_topk)
    from tim_tpu.evals.format_predictions import gt_to_columns
    from tim_tpu.runner import DetectionRunner

    b = synthetic.synthetic_epic(seed=5, num_videos=2, video_seconds=40.0,
                                 per_video=6, visual_dim=16, audio_dim=12,
                                 visual_classes=(4,), audio_classes=3)
    num_feats = 6
    window_size = num_feats * 2 * 0.2
    v_norm = normalize_actions(b["v_actions"], "visual", detection=True,
                               window_size=window_size)
    a_norm = normalize_actions(b["a_actions"], "audio", detection=True,
                               window_size=window_size)
    ws = build_detection_windows(
        v_norm, a_norm, b["video_info"], b["v_feat_times"],
        num_feats=num_feats, feat_stride=2, feat_gap=0.2)
    v1 = {k: v[:, :1] for k, v in b["v_feats"].items()}
    a1 = {k: v[:, :1] for k, v in b["a_feats"].items()}
    ds = DetectionDataset(ws, FeatureStore(v1, b["v_feat_times"]),
                          FeatureStore(a1, b["a_feat_times"]),
                          sample_augmentations=False,
                          include_verb_noun=False,
                          dataset_name="synthetic")
    cfg = C.DetectionConfig(
        visual_classes=(4,), audio_classes=3,
        visual_input_dim=16, audio_input_dim=12, d_model=16, nhead=2,
        num_layers=1, num_feats=num_feats, compute_dtype="float32",
        train_query_size=0.1, inference_query_size=0.2)
    tcfg = C.TrainConfig(batch_size=4, lambda_drloc=0.0)

    runner = DetectionRunner(cfg, tcfg, ds, ds,
                             mesh_cfg=C.MeshConfig(data=1))
    runner.init_state()

    dense = runner.extract_dense_predictions()
    topk = runner.extract_dense_predictions(top_k=4)   # == num classes
    thr = 0.4
    c_dense = threshold_predictions(
        dense["video_ids"], dense["v_proposals"], dense["action"], thr)
    c_topk = threshold_predictions_topk(
        topk["video_ids"], topk["v_proposals"],
        topk["action_topk_values"], topk["action_topk_classes"], thr)
    assert set(c_dense) == set(c_topk)
    for vid in c_dense:
        want = sorted(zip(c_dense[vid]["labels"],
                          map(tuple, c_dense[vid]["segments"]),
                          np.round(c_dense[vid]["scores"], 6)))
        got = sorted(zip(c_topk[vid]["labels"],
                         map(tuple, c_topk[vid]["segments"]),
                         np.round(c_topk[vid]["scores"], 6)))
        assert want == got, vid

    # end-to-end mAP equality through evaluate_detections
    from tim_tpu.data.windows import timestamp_to_seconds
    va = b["v_actions"]
    gt = gt_to_columns(
        va["video_id"].to_numpy(object),
        va["start_timestamp"].apply(timestamp_to_seconds).to_numpy(float),
        va["stop_timestamp"].apply(timestamp_to_seconds).to_numpy(float),
        va["action_class"].to_numpy())
    m1, a1_, _ = evaluate_detections(
        dense["video_ids"], dense["v_proposals"], dense["action"], gt,
        score_threshold=thr, task="action")
    m2, a2_, _ = evaluate_detections(
        topk["video_ids"], topk["v_proposals"],
        (topk["action_topk_values"], topk["action_topk_classes"]), gt,
        score_threshold=thr, task="action")
    np.testing.assert_allclose(m1, m2, atol=1e-9)
    assert abs(a1_ - a2_) <= 1e-9

    # bank path agrees with the host top-k dump
    banked = DetectionRunner(cfg, tcfg, ds, ds,
                             mesh_cfg=C.MeshConfig(data=1),
                             use_device_bank=True)
    banked.init_state()
    banked.state = banked.state.replace(params=runner.state.params)
    tb = banked.extract_dense_predictions(top_k=4)
    np.testing.assert_allclose(tb["action_topk_values"],
                               topk["action_topk_values"], atol=1e-5)
    np.testing.assert_array_equal(tb["action_topk_classes"],
                                  topk["action_topk_classes"])

    # truncating k yields a subset of the dense candidates
    t1 = runner.extract_dense_predictions(top_k=1)
    c1 = threshold_predictions_topk(
        t1["video_ids"], t1["v_proposals"],
        t1["action_topk_values"], t1["action_topk_classes"], thr)
    n1 = sum(len(e["scores"]) for e in c1.values())
    nd = sum(len(e["scores"]) for e in c_dense.values())
    assert n1 <= nd
