"""Golden parity: our window precompute vs the *actual reference*
``SlidingWindowDataset`` executed in-process on synthetic data.

The reference code is imported read-only from /root/reference with its
logging util stubbed (fvcore/simplejson are not installed here). This
pins down the float-rounding and padding semantics of
``recognition/.../datasets/sliding_window.py`` exactly.
"""

import os
import sys
import types

import numpy as np
import pytest

from tim_tpu.data import synthetic
from tim_tpu.data.windows import (
    build_recognition_windows, build_detection_windows, normalize_actions)
from tim_tpu.data.dataset import FeatureStore, RecognitionDataset

REF_REC = "/root/reference/recognition"
REF_DET = "/root/reference/detection"


def _import_reference_dataset(ref_root, tmp_path, monkeypatch):
    pd = pytest.importorskip("pandas")
    pytest.importorskip("torch")

    # Stub the reference's logging util (pulls fvcore + simplejson).
    import logging as _pylogging
    stub = types.ModuleType("time_interval_machine.utils.logging")
    stub.get_logger = lambda name: _pylogging.getLogger(name)
    pkg = types.ModuleType("time_interval_machine")
    utils_pkg = types.ModuleType("time_interval_machine.utils")
    datasets_pkg = types.ModuleType("time_interval_machine.datasets")
    pkg.__path__ = [os.path.join(ref_root, "time_interval_machine")]
    utils_pkg.__path__ = [
        os.path.join(ref_root, "time_interval_machine/utils")]
    datasets_pkg.__path__ = [
        os.path.join(ref_root, "time_interval_machine/datasets")]
    for name, mod in {
        "time_interval_machine": pkg,
        "time_interval_machine.utils": utils_pkg,
        "time_interval_machine.utils.logging": stub,
        "time_interval_machine.datasets": datasets_pkg,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_sliding_window",
        os.path.join(ref_root, "time_interval_machine/datasets/"
                     "sliding_window.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_bundle(bundle, tmp_path, mode="train"):
    import pandas as pd

    paths = {}
    os.makedirs(tmp_path / "vfeats" / mode, exist_ok=True)
    os.makedirs(tmp_path / "afeats" / mode, exist_ok=True)
    for vid, arr in bundle["v_feats"].items():
        np.save(tmp_path / "vfeats" / mode / f"{vid}.npy", arr)
    for vid, arr in bundle["a_feats"].items():
        np.save(tmp_path / "afeats" / mode / f"{vid}.npy", arr)

    def ctx_frame(feat_times):
        rows = []
        for vid, ft in feat_times.items():
            for s, e in ft:
                rows.append({"video_id": vid, "start_sec": float(s),
                             "stop_sec": float(e),
                             "narration_sec": float(s)})
        return pd.DataFrame(rows)

    paths["v_ctx"] = tmp_path / "v_ctx.pkl"
    ctx_frame(bundle["v_feat_times"]).to_pickle(paths["v_ctx"])
    paths["a_ctx"] = tmp_path / "a_ctx.pkl"
    ctx_frame(bundle["a_feat_times"]).to_pickle(paths["a_ctx"])
    paths["v_actions"] = tmp_path / "v_actions_epic.pkl"
    bundle["v_actions"].to_pickle(paths["v_actions"])
    paths["a_actions"] = tmp_path / "a_actions_epic.pkl"
    bundle["a_actions"].to_pickle(paths["a_actions"])
    paths["video_info"] = tmp_path / "video_info.pkl"
    bundle["video_info"].to_pickle(paths["video_info"])
    return paths


@pytest.fixture(scope="module")
def bundle():
    return synthetic.synthetic_epic(seed=3, num_videos=3, per_video=14)


def _edge_case_bundle():
    """Adversarial annotations: actions clipped at video end, actions just
    above/below the 0.2 s partial-query minimum, near-window-length
    actions, dense overlaps."""
    import pandas as pd

    b = synthetic.synthetic_epic(seed=9, num_videos=2, per_video=4,
                                 video_seconds=30.0)
    rows = []
    for vid, dur in b["durations"].items():
        for start, end in [
            (0.0, 0.25),              # tiny action at video start
            (dur - 0.3, dur + 2.0),   # runs past the video end (clipped)
            (1.05, 1.24),             # 0.19s: below min partial size
            (2.0, 2.21),              # 0.21s: just above
            (0.5, dur - 0.5),         # nearly video-length
            (5.0, 5.0 + 3.99),        # just under a 4s window
            (5.1, 5.1 + 3.99),        # heavy overlap with previous
        ]:
            rows.append({
                "video_id": vid,
                "start_timestamp": synthetic._fmt_ts(start),
                "stop_timestamp": synthetic._fmt_ts(min(end, dur + 2.0)),
                "verb_class": 1, "noun_class": 2, "action_class": 3,
                "narration": "edge",
            })
    df = pd.DataFrame(rows)
    df.index = pd.Index([f"e{i:04d}" for i in range(len(df))],
                        name="narration_id")
    b["v_actions"] = df
    return b


@pytest.mark.parametrize("case", ["seed5", "edges"])
def test_recognition_windows_fuzz(case, tmp_path, monkeypatch):
    """Golden parity on additional random + adversarial annotation sets."""
    bundle = (synthetic.synthetic_epic(seed=5, num_videos=2, per_video=20,
                                       video_seconds=61.0)
              if case == "seed5" else _edge_case_bundle())
    ref = _import_reference_dataset(REF_REC, tmp_path, monkeypatch)
    paths = _write_bundle(bundle, tmp_path)
    monkeypatch.chdir(tmp_path)

    ref_ds = ref.SlidingWindowDataset(
        v_data_path=str(tmp_path / "vfeats"),
        a_data_path=str(tmp_path / "afeats"),
        v_action_labels_pickle=str(paths["v_actions"]),
        a_action_labels_pickle=str(paths["a_actions"]),
        v_context_labels_pickle=str(paths["v_ctx"]),
        a_context_labels_pickle=str(paths["a_ctx"]),
        video_info_pkl=str(paths["video_info"]),
        num_feats=10, feat_stride=2, feat_gap=0.2, mode="train",
    )
    v_norm = normalize_actions(bundle["v_actions"], "visual")
    a_norm = normalize_actions(bundle["a_actions"], "audio")
    ours = build_recognition_windows(
        v_norm, a_norm, bundle["video_info"], bundle["v_feat_times"],
        num_feats=10, feat_stride=2, feat_gap=0.2)

    assert len(ours.windows) == len(ref_ds.windows)
    assert ours.max_visual_actions == ref_ds.max_visual_actions
    assert ours.max_audio_actions == ref_ds.max_audio_actions
    for mine, theirs in zip(ours.windows, ref_ds.windows):
        np.testing.assert_array_equal(
            mine.feat_indices, theirs["feat_indices"].numpy())
        np.testing.assert_allclose(
            mine.v_queries, theirs["v_queries"].numpy(), atol=1e-5)
        np.testing.assert_array_equal(
            mine.v_labels, theirs["v_labels"].numpy())
        assert mine.v_narration_ids == theirs["v_narration_ids"]


def test_recognition_windows_match_reference(bundle, tmp_path, monkeypatch):
    ref = _import_reference_dataset(REF_REC, tmp_path, monkeypatch)
    paths = _write_bundle(bundle, tmp_path)
    monkeypatch.chdir(tmp_path)  # reference caches precomputed_windows/ in cwd

    num_feats, feat_stride, feat_gap = 10, 2, 0.2
    ref_ds = ref.SlidingWindowDataset(
        v_data_path=str(tmp_path / "vfeats"),
        a_data_path=str(tmp_path / "afeats"),
        v_action_labels_pickle=str(paths["v_actions"]),
        a_action_labels_pickle=str(paths["a_actions"]),
        v_context_labels_pickle=str(paths["v_ctx"]),
        a_context_labels_pickle=str(paths["a_ctx"]),
        video_info_pkl=str(paths["video_info"]),
        num_feats=num_feats, feat_stride=feat_stride, feat_gap=feat_gap,
        mode="train",
    )

    v_norm = normalize_actions(bundle["v_actions"], "visual")
    a_norm = normalize_actions(bundle["a_actions"], "audio")
    ours = build_recognition_windows(
        v_norm, a_norm, bundle["video_info"], bundle["v_feat_times"],
        num_feats=num_feats, feat_stride=feat_stride, feat_gap=feat_gap)

    assert len(ours.windows) == len(ref_ds.windows)
    assert ours.max_visual_actions == ref_ds.max_visual_actions
    assert ours.max_audio_actions == ref_ds.max_audio_actions
    assert ours.num_actions == ref_ds.num_actions

    for mine, theirs in zip(ours.windows, ref_ds.windows):
        assert mine.video_id == theirs["video_id"]
        assert mine.start_sec == pytest.approx(theirs["start_sec"])
        assert mine.stop_sec == pytest.approx(theirs["stop_sec"])
        np.testing.assert_array_equal(
            mine.feat_indices, theirs["feat_indices"].numpy())
        np.testing.assert_allclose(
            mine.v_queries, theirs["v_queries"].numpy(), atol=1e-5)
        np.testing.assert_array_equal(
            mine.v_labels, theirs["v_labels"].numpy())
        np.testing.assert_allclose(
            mine.a_queries, theirs["a_queries"].numpy(), atol=1e-5)
        assert mine.v_narration_ids == theirs["v_narration_ids"]
        assert mine.a_narration_ids == theirs["a_narration_ids"]

    # __getitem__ parity with augmentation sampling disabled (num_aug dim 0
    # is deterministic when we force index 0 on both sides).
    v_store = FeatureStore(
        {k: v[:, :1] for k, v in bundle["v_feats"].items()},
        bundle["v_feat_times"])
    a_store = FeatureStore(
        {k: v[:, :1] for k, v in bundle["a_feats"].items()},
        bundle["a_feat_times"])
    ds = RecognitionDataset(ours, v_store, a_store,
                            sample_augmentations=False)
    ref_ds.v_num_aug = 1
    ref_ds.a_num_aug = 1
    for i in (0, len(ds) // 2, len(ds) - 1):
        mine = ds[i]
        v_data, a_data, times, label, meta = ref_ds[i]
        np.testing.assert_allclose(mine["v_feats"], v_data.numpy(),
                                   atol=1e-6)
        np.testing.assert_allclose(mine["a_feats"], a_data.numpy(),
                                   atol=1e-6)
        np.testing.assert_allclose(mine["times"], times.numpy(), atol=1e-6)
        for key in ("verb", "noun", "action", "class_id"):
            np.testing.assert_array_equal(mine[key], label[key].numpy())
        np.testing.assert_array_equal(
            mine["v_action_ids"], meta["v_action_ids"].numpy())


def test_detection_windows_match_reference(bundle, tmp_path, monkeypatch):
    ref = _import_reference_dataset(REF_DET, tmp_path, monkeypatch)
    paths = _write_bundle(bundle, tmp_path)
    monkeypatch.chdir(tmp_path)
    # the detection variant expects the windows cache dir to pre-exist
    os.makedirs(tmp_path / "precomputed_windows", exist_ok=True)

    num_feats, feat_stride, feat_gap = 10, 2, 0.2
    ref_ds = ref.SlidingWindowDataset(
        v_data_path=str(tmp_path / "vfeats"),
        a_data_path=str(tmp_path / "afeats"),
        v_action_labels_pickle=str(paths["v_actions"]),
        a_action_labels_pickle=str(paths["a_actions"]),
        v_context_labels_pickle=str(paths["v_ctx"]),
        a_context_labels_pickle=str(paths["a_ctx"]),
        video_info_pkl=str(paths["video_info"]),
        num_feats=num_feats, feat_stride=feat_stride, feat_gap=feat_gap,
        mode="train", include_verb_noun=False,
    )

    v_norm = normalize_actions(bundle["v_actions"], "visual",
                               detection=True, window_size=4.0)
    a_norm = normalize_actions(bundle["a_actions"], "audio",
                               detection=True, window_size=4.0)
    ours = build_detection_windows(
        v_norm, a_norm, bundle["video_info"], bundle["v_feat_times"],
        num_feats=num_feats, feat_stride=feat_stride, feat_gap=feat_gap)

    assert len(ours.windows) == len(ref_ds.windows)
    assert ours.max_visual_actions == ref_ds.max_visual_actions
    assert ours.max_audio_actions == ref_ds.max_audio_actions

    for mine, theirs in zip(ours.windows, ref_ds.windows):
        assert mine.video_id == theirs["video_id"]
        assert mine.start_sec == pytest.approx(theirs["start_sec"])
        np.testing.assert_array_equal(
            mine.feat_indices, theirs["feat_indices"].numpy())
        if "v_gt_segments" in theirs:
            np.testing.assert_allclose(
                mine.v_queries, theirs["v_gt_segments"].numpy(), atol=1e-5)
            np.testing.assert_array_equal(
                mine.v_labels, theirs["v_labels"].numpy())
            np.testing.assert_allclose(
                mine.a_queries, theirs["a_gt_segments"].numpy(), atol=1e-5)
        else:
            assert mine.v_queries.shape[0] == 0
            assert mine.a_queries.shape[0] == 0

    # __getitem__ parity (normalized times, gt segments, label selection)
    from tim_tpu.data.dataset import DetectionDataset

    v_store = FeatureStore(
        {k: v[:, :1] for k, v in bundle["v_feats"].items()},
        bundle["v_feat_times"])
    a_store = FeatureStore(
        {k: v[:, :1] for k, v in bundle["a_feats"].items()},
        bundle["a_feat_times"])
    ds = DetectionDataset(ours, v_store, a_store,
                          sample_augmentations=False,
                          include_verb_noun=False, verb_only=True,
                          dataset_name="epic")
    ref_ds.v_num_aug = 1
    ref_ds.a_num_aug = 1
    nv_pad = max(ours.max_visual_actions, 1)
    for i in (0, len(ds) // 3, len(ds) - 1):
        mine = ds[i]
        v_data, a_data, times, label, meta = ref_ds[i]
        np.testing.assert_allclose(mine["v_feats"], v_data.numpy(),
                                   atol=1e-6)
        np.testing.assert_allclose(mine["times"], times.numpy(), atol=1e-6)
        ref_v_seg = label["v_gt_segments"].numpy()
        np.testing.assert_allclose(
            mine["v_gt_segments"][:len(ref_v_seg)], ref_v_seg, atol=1e-6)
        ref_action = label["action"].numpy()
        np.testing.assert_array_equal(
            mine["action"][:len(ref_action)], ref_action)
        np.testing.assert_array_equal(
            mine["class_id"][:len(label["class_id"])],
            label["class_id"].numpy())
        assert float(meta["window_start"]) == float(mine["window_start"])
