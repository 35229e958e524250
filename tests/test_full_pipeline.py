"""Stage A -> B -> C integration: raw media -> backbone feature extraction
-> merged banks -> TIM training -> dense detection -> mAP.

The reference runs this as three separate CLI programs over three
sub-projects (SURVEY.md §1); here it's one process over the same on-disk
formats, with tiny backbones for CPU speed.
"""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    """Synthetic raw media: frame JPEGs + wavs + annotations."""
    from PIL import Image
    from scipy.io import wavfile

    import pandas as pd
    from tim_tpu.data import synthetic
    from tim_tpu.extract.tables import (
        build_feature_time_table, build_video_info)

    tmp = tmp_path_factory.mktemp("pipeline")
    rng = np.random.default_rng(0)
    durations = {"P01_01": 12.0, "P01_02": 14.0}
    fps, sr = 10.0, 24000

    for vid, dur in durations.items():
        d = tmp / "frames" / vid
        os.makedirs(d)
        for i in range(int(dur * fps)):
            Image.fromarray(rng.integers(0, 255, (48, 64, 3),
                                         dtype=np.uint8)).save(
                d / f"frame_{i:010d}.jpg")
        os.makedirs(tmp / "audio", exist_ok=True)
        wavfile.write(tmp / "audio" / f"{vid}.wav", sr,
                      (rng.normal(size=int(sr * dur)) * 0.1).astype(
                          np.float32))

    table = build_feature_time_table(durations, interval=1.1, hop=0.5,
                                     fps=fps)
    table.to_pickle(tmp / "ctx.pkl")
    build_video_info(durations, fps).to_pickle(tmp / "video_info.pkl")

    v_actions = synthetic.make_actions(
        durations, rng, per_video=6, classes=(4,), min_len=0.5,
        max_len=2.5)
    # single-task visual labels (action only)
    a_actions = synthetic.make_actions(
        durations, rng, per_video=6, classes=(3,), audio=True,
        min_len=0.5, max_len=2.5)
    v_actions.to_pickle(tmp / "v_actions.pkl")
    a_actions.to_pickle(tmp / "a_actions.pkl")
    return tmp, durations, table


@pytest.mark.slow
def test_three_stage_pipeline(media, monkeypatch):
    tmp, durations, table = media
    import pandas as pd

    # ---- Stage A: feature extraction with tiny backbones --------------
    from tim_tpu.extract import cli as ecli
    from tim_tpu.models.backbones import vit

    monkeypatch.setattr(
        ecli, "_make_visual_apply",
        lambda args: _tiny_visual_apply())
    common = ["--feature_times", str(tmp / "ctx.pkl"), "--split", "train",
              "--num_aug", "1", "--batch_size", "4"]
    ecli.main(["--backbone", "omnivore",
               "--frames_dir", str(tmp / "frames"),
               "--out_dir", str(tmp / "omni"),
               "--num_frames", "8", "--crop_size", "48"] + common)
    ecli.main(["--backbone", "videomae",
               "--frames_dir", str(tmp / "frames"),
               "--out_dir", str(tmp / "mae"),
               "--num_frames", "8", "--crop_size", "48"] + common)
    ecli.main(["--backbone", "slowfast",
               "--audio_dir", str(tmp / "audio"),
               "--out_dir", str(tmp / "audio_feats")] + common)

    # merge visual streams (Omnivore || VideoMAE)
    from tim_tpu.extract.pipeline import merge_feature_dirs
    n = merge_feature_dirs(str(tmp / "omni"), str(tmp / "mae"),
                           str(tmp / "merged"), expected_dim=16)
    assert n == 2
    merged = np.load(tmp / "merged" / "train" / "P01_01.npy")
    assert merged.shape[-1] == 32

    # ---- Stage B: TIM detection training on the extracted banks -------
    from tim_tpu import config as C
    from tim_tpu.data.dataset import DetectionDataset, FeatureStore
    from tim_tpu.data.windows import (
        build_detection_windows, normalize_actions)
    from tim_tpu.runner import DetectionRunner

    num_feats = 6
    window_size = num_feats * 1 * 0.5  # feat_stride 1, feat_gap 0.5
    v_norm = normalize_actions(pd.read_pickle(tmp / "v_actions.pkl"),
                               "visual", detection=True,
                               window_size=window_size)
    a_norm = normalize_actions(pd.read_pickle(tmp / "a_actions.pkl"),
                               "audio", detection=True,
                               window_size=window_size)
    v_store = FeatureStore.from_npy_dir(str(tmp / "merged"), "train", table)
    a_store = FeatureStore.from_npy_dir(str(tmp / "audio_feats"), "train",
                                        table)
    ws = build_detection_windows(
        v_norm, a_norm, pd.read_pickle(tmp / "video_info.pkl"),
        v_store.feat_times, num_feats=num_feats, feat_stride=1,
        feat_gap=0.5, window_stride=1.0)
    ds = DetectionDataset(ws, v_store, a_store, include_verb_noun=False,
                          dataset_name="synthetic")

    cfg = C.DetectionConfig(
        visual_classes=(4,), audio_classes=3,
        visual_input_dim=32, audio_input_dim=2304,
        d_model=16, nhead=2, num_layers=1, num_feats=num_feats,
        compute_dtype="float32", train_query_size=0.1,
        inference_query_size=0.2)
    tcfg = C.TrainConfig(batch_size=4, epochs=1, warmup_epochs=0,
                         lr=1e-3, lambda_drloc=0.0, normaliser_init=10.0)
    runner = DetectionRunner(cfg, tcfg, ds, ds, print_freq=50,
                             mesh_cfg=C.MeshConfig(data=4, model=1))
    runner.fit()

    # ---- Stage C: dense extraction -> NMS -> mAP ----------------------
    from tim_tpu.evals.format_predictions import gt_to_columns
    gt = gt_to_columns(
        v_norm["video_id"].to_numpy(object),
        v_norm["start_sec"].to_numpy(),
        v_norm["stop_sec"].to_numpy(),
        v_norm["action_class"].to_numpy())
    m_ap, avg, submission = runner.evaluate_mAP(gt, score_threshold=0.005)
    assert m_ap.shape == (5,)
    assert np.isfinite(avg)
    from tim_tpu.evals.format_predictions import validate_submission
    validate_submission(submission, num_classes=4)


def _tiny_visual_apply():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 16)) * 0.1

    @jax.jit
    def apply_fn(clips):  # [B, T, H, W, 3] -> [B, 16]
        return jnp.mean(clips, axis=(1, 2, 3)) @ w

    return apply_fn
