"""End-to-end runner integration on synthetic data: fit -> validate ->
extract, recognition and detection, with accuracy/mAP sanity."""

import numpy as np
import jax
import pytest

from tim_tpu import config as C
from tim_tpu.data import synthetic
from tim_tpu.data.dataset import (
    DetectionDataset, FeatureStore, RecognitionDataset)
from tim_tpu.data.windows import (
    build_detection_windows, build_recognition_windows, normalize_actions)
from tim_tpu.evals.format_predictions import gt_to_columns
from tim_tpu.runner import DetectionRunner, RecognitionRunner


@pytest.fixture(scope="module")
def bundle():
    # features correlated with labels so a tiny model can learn:
    # class-dependent offsets are injected below
    b = synthetic.synthetic_epic(
        seed=7, num_videos=2, video_seconds=45.0, per_video=8,
        visual_dim=24, audio_dim=16, visual_classes=(5, 6, 4),
        audio_classes=3)
    return b


def _stores(bundle):
    return (FeatureStore(bundle["v_feats"], bundle["v_feat_times"]),
            FeatureStore(bundle["a_feats"], bundle["a_feat_times"]))


def test_recognition_runner_fit_and_extract(bundle, tmp_path):
    v_norm = normalize_actions(bundle["v_actions"], "visual")
    a_norm = normalize_actions(bundle["a_actions"], "audio")
    ws = build_recognition_windows(
        v_norm, a_norm, bundle["video_info"], bundle["v_feat_times"],
        num_feats=6, feat_stride=2, feat_gap=0.2)
    v_store, a_store = _stores(bundle)
    train_ds = RecognitionDataset(ws, v_store, a_store)
    val_ds = RecognitionDataset(ws, v_store, a_store,
                                sample_augmentations=False)

    cfg = C.ModelConfig(
        visual_classes=(5, 6, 4), audio_classes=3,
        visual_input_dim=24, audio_input_dim=16, d_model=16, nhead=2,
        num_layers=1, num_feats=6, compute_dtype="float32")
    tcfg = C.TrainConfig(batch_size=8, epochs=2, warmup_epochs=0,
                         lr=1e-3, mixup_alpha=0.0, lambda_drloc=0.0,
                         seed=0)
    runner = RecognitionRunner(cfg, tcfg, train_ds, val_ds,
                               output_dir=str(tmp_path), print_freq=10)
    stats = runner.fit()
    assert "action_top1" in stats and "audio_top1" in stats
    assert "verb_noun_top1" in stats
    assert np.isfinite(stats["loss_action"])
    assert (tmp_path / "checkpoint.msgpack").exists()

    dump = runner.extract_predictions(path=str(tmp_path / "preds.pkl"))
    n_visual = (ws.num_actions + 1) // 2  # half visual half audio
    assert dump["action"].shape[1] == 4
    assert len(dump["v_narration_ids"]) == dump["action"].shape[0]
    np.testing.assert_allclose(dump["action"].sum(1), 1.0, atol=1e-5)
    assert (tmp_path / "preds.pkl").exists()


def test_recognition_runner_device_bank(bundle, tmp_path):
    """fit() via the HBM-resident bank path (batch = window ids)."""
    v_norm = normalize_actions(bundle["v_actions"], "visual")
    a_norm = normalize_actions(bundle["a_actions"], "audio")
    ws = build_recognition_windows(
        v_norm, a_norm, bundle["video_info"], bundle["v_feat_times"],
        num_feats=6, feat_stride=2, feat_gap=0.2)
    v_store, a_store = _stores(bundle)
    train_ds = RecognitionDataset(ws, v_store, a_store)
    val_ds = RecognitionDataset(ws, v_store, a_store,
                                sample_augmentations=False)
    cfg = C.ModelConfig(
        visual_classes=(5, 6, 4), audio_classes=3,
        visual_input_dim=24, audio_input_dim=16, d_model=16, nhead=2,
        num_layers=1, num_feats=6, compute_dtype="float32")
    tcfg = C.TrainConfig(batch_size=8, epochs=1, warmup_epochs=0,
                         lr=1e-3, mixup_alpha=0.0, lambda_drloc=0.0)
    runner = RecognitionRunner(cfg, tcfg, train_ds, val_ds,
                               print_freq=5, use_device_bank=True)
    stats = runner.fit()
    assert np.isfinite(stats["loss_action"])
    assert "action_top1" in stats


def test_detection_runner_device_bank(bundle):
    num_feats = 8
    window_size = num_feats * 2 * 0.2
    v_norm = normalize_actions(bundle["v_actions"], "visual",
                               detection=True, window_size=window_size)
    a_norm = normalize_actions(bundle["a_actions"], "audio",
                               detection=True, window_size=window_size)
    ws = build_detection_windows(
        v_norm, a_norm, bundle["video_info"], bundle["v_feat_times"],
        num_feats=num_feats, feat_stride=2, feat_gap=0.2)
    v_store, a_store = _stores(bundle)
    train_ds = DetectionDataset(ws, v_store, a_store,
                                include_verb_noun=False,
                                dataset_name="synthetic")
    cfg = C.DetectionConfig(
        visual_classes=(4,), audio_classes=3,
        visual_input_dim=24, audio_input_dim=16, d_model=16, nhead=2,
        num_layers=1, num_feats=num_feats, compute_dtype="float32",
        train_query_size=0.1, inference_query_size=0.2)
    tcfg = C.TrainConfig(batch_size=8, epochs=1, warmup_epochs=0,
                         lr=1e-3, lambda_drloc=0.0, normaliser_init=10.0)
    runner = DetectionRunner(cfg, tcfg, train_ds, train_ds, print_freq=5,
                             use_device_bank=True)
    runner.init_state()
    stats = runner.train_epoch(0, __import__("jax").random.PRNGKey(0))
    assert np.isfinite(stats["loss"])

    # banked batch matches the host dataset example exactly (aug=1)
    host = train_ds[3]
    import jax.numpy as jnp
    bank_batch = runner._tables.batch(jnp.asarray([3]))
    np.testing.assert_allclose(np.asarray(bank_batch["times"][0]),
                               host["times"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(bank_batch["v_gt_segments"][0]),
                               host["v_gt_segments"], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(bank_batch["action"][0]),
                                  host["action"])
    assert float(bank_batch["window_start"][0]) == float(
        host["window_start"])


def test_detection_runner_fit_and_map(bundle, tmp_path):
    num_feats = 8
    window_size = num_feats * 2 * 0.2
    v_norm = normalize_actions(bundle["v_actions"], "visual",
                               detection=True, window_size=window_size)
    a_norm = normalize_actions(bundle["a_actions"], "audio",
                               detection=True, window_size=window_size)
    ws = build_detection_windows(
        v_norm, a_norm, bundle["video_info"], bundle["v_feat_times"],
        num_feats=num_feats, feat_stride=2, feat_gap=0.2)
    v_store, a_store = _stores(bundle)
    train_ds = DetectionDataset(ws, v_store, a_store,
                                include_verb_noun=False,
                                dataset_name="synthetic")
    val_ds = DetectionDataset(ws, v_store, a_store,
                              include_verb_noun=False,
                              dataset_name="synthetic",
                              sample_augmentations=False)

    cfg = C.DetectionConfig(
        visual_classes=(4,), audio_classes=3,
        visual_input_dim=24, audio_input_dim=16, d_model=16, nhead=2,
        num_layers=1, num_feats=num_feats, compute_dtype="float32",
        train_query_size=0.05, inference_query_size=0.1)
    tcfg = C.TrainConfig(batch_size=8, epochs=1, warmup_epochs=0,
                         lr=1e-3, lambda_drloc=0.0, normaliser_init=30.0,
                         seed=0)
    runner = DetectionRunner(cfg, tcfg, train_ds, val_ds,
                             output_dir=str(tmp_path), print_freq=10)
    stats = runner.fit()
    assert np.isfinite(stats["loss"])

    # mAP over the synthetic GT — random-ish model, just exercise the path
    v_norm_gt = v_norm
    gt = gt_to_columns(
        v_norm_gt["video_id"].to_numpy(object),
        v_norm_gt["start_sec"].to_numpy(),
        v_norm_gt["stop_sec"].to_numpy(),
        v_norm_gt["action_class"].to_numpy())
    m_ap, avg, submission = runner.evaluate_mAP(
        gt, score_threshold=0.01, n_jobs=1)
    assert m_ap.shape == (5,)
    assert 0.0 <= avg <= 1.0

    dump = runner.extract_dense_predictions()
    assert dump["v_proposals"].shape[0] == dump["video_ids"].shape[0]
    assert dump["action"].shape[1] == 4


def test_detection_fit_with_periodic_mAP(bundle, tmp_path):
    """fit(eval_mAP_gt=...) logs in-training mAP (beyond the reference's
    loss-only model selection)."""
    num_feats = 8
    window_size = num_feats * 2 * 0.2
    v_norm = normalize_actions(bundle["v_actions"], "visual",
                               detection=True, window_size=window_size)
    a_norm = normalize_actions(bundle["a_actions"], "audio",
                               detection=True, window_size=window_size)
    ws = build_detection_windows(
        v_norm, a_norm, bundle["video_info"], bundle["v_feat_times"],
        num_feats=num_feats, feat_stride=2, feat_gap=0.2)
    v_store, a_store = _stores(bundle)
    ds = DetectionDataset(ws, v_store, a_store, include_verb_noun=False,
                          dataset_name="synthetic",
                          sample_augmentations=False)
    cfg = C.DetectionConfig(
        visual_classes=(4,), audio_classes=3,
        visual_input_dim=24, audio_input_dim=16, d_model=16, nhead=2,
        num_layers=1, num_feats=num_feats, compute_dtype="float32",
        train_query_size=0.1, inference_query_size=0.2)
    tcfg = C.TrainConfig(batch_size=8, epochs=1, warmup_epochs=0,
                         lr=1e-3, lambda_drloc=0.0, normaliser_init=10.0)
    runner = DetectionRunner(cfg, tcfg, ds, ds, output_dir=str(tmp_path),
                             print_freq=50)
    gt = gt_to_columns(
        v_norm["video_id"].to_numpy(object),
        v_norm["start_sec"].to_numpy(), v_norm["stop_sec"].to_numpy(),
        v_norm["action_class"].to_numpy())
    stats = runner.fit(eval_mAP_gt=gt, eval_mAP_every=1,
                       score_threshold=0.01, n_jobs=1)
    assert "val_avg_mAP" in stats
    assert 0.0 <= stats["val_avg_mAP"] <= 1.0
