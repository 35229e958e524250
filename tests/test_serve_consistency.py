"""DetectionServer must produce the same detections as the offline chain
(runner dense dump -> threshold -> Soft-NMS) on identical data."""

import numpy as np
import jax
import jax.numpy as jnp

from tim_tpu import config as C
from tim_tpu.data import synthetic
from tim_tpu.data.dataset import DetectionDataset, FeatureStore
from tim_tpu.data.windows import build_detection_windows, normalize_actions
from tim_tpu.evals.format_predictions import (
    nms_per_video, threshold_predictions)
from tim_tpu.runner import DetectionRunner
from tim_tpu.serve import DetectionServer


def test_server_matches_offline_chain():
    b = synthetic.synthetic_epic(seed=4, num_videos=1, video_seconds=30.0,
                                 per_video=5, visual_dim=16, audio_dim=12,
                                 visual_classes=(4,), audio_classes=3)
    vid = next(iter(b["durations"]))
    feat_stride, feat_gap, num_feats = 2, 0.2, 6
    window_size = num_feats * feat_gap * feat_stride
    v_norm = normalize_actions(b["v_actions"], "visual", detection=True,
                               window_size=window_size)
    a_norm = normalize_actions(b["a_actions"], "audio", detection=True,
                               window_size=window_size)
    ws = build_detection_windows(
        v_norm, a_norm, b["video_info"], b["v_feat_times"],
        num_feats=num_feats, feat_stride=feat_stride, feat_gap=feat_gap)

    # single augmentation set so both paths see identical features
    v_feats1 = {k: v[:, :1] for k, v in b["v_feats"].items()}
    a_feats1 = {k: v[:, :1] for k, v in b["a_feats"].items()}
    v_store = FeatureStore(v_feats1, b["v_feat_times"])
    a_store = FeatureStore(a_feats1, b["a_feat_times"])
    ds = DetectionDataset(ws, v_store, a_store, sample_augmentations=False,
                          include_verb_noun=False,
                          dataset_name="synthetic")

    cfg = C.DetectionConfig(
        visual_classes=(4,), audio_classes=3,
        visual_input_dim=16, audio_input_dim=12, d_model=16, nhead=2,
        num_layers=1, num_feats=num_feats, compute_dtype="float32",
        inference_query_size=0.2)
    tcfg = C.TrainConfig(batch_size=4)
    runner = DetectionRunner(cfg, tcfg, None, ds,
                             mesh_cfg=C.MeshConfig(data=1))
    runner.init_state()

    # offline chain
    dump = runner.extract_dense_predictions()
    score_thr, sigma, iou = 0.01, 0.25, 0.1
    cands = threshold_predictions(dump["video_ids"], dump["v_proposals"],
                                  dump["action"], score_thr)
    offline = nms_per_video(cands, iou_threshold=iou, sigma=sigma)[vid]

    # serving path on the same banks
    server = DetectionServer(cfg, runner.state.params,
                             feat_stride=feat_stride, feat_gap=feat_gap,
                             batch_size=4)
    dets = server.detect_video(
        v_feats1[vid][:, 0], a_feats1[vid][:, 0],
        b["v_feat_times"][vid], b["durations"][vid],
        score_threshold=score_thr, nms_sigma=sigma, nms_iou=iou)

    assert len(dets["scores"]) == len(offline["scores"])
    np.testing.assert_allclose(np.sort(dets["scores"]),
                               np.sort(offline["scores"]), atol=1e-4)
    order_a = np.lexsort((dets["segments"][:, 0], dets["labels"]))
    order_b = np.lexsort((offline["segments"][:, 0], offline["labels"]))
    np.testing.assert_allclose(dets["segments"][order_a],
                               offline["segments"][order_b], atol=1e-3)
    np.testing.assert_array_equal(dets["labels"][order_a],
                                  offline["labels"][order_b])
