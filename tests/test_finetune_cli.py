"""The backbone finetune/pretrain CLI end-to-end on synthetic frames
(tiny ViT): both modes run one epoch and write a checkpoint; the
pretraining dataset samples RANDOM clips (not the deterministic
validation transform)."""

import os

import numpy as np
import pytest


@pytest.fixture()
def clip_data(tmp_path):
    import pandas as pd
    cv2 = pytest.importorskip("cv2")

    rng = np.random.default_rng(0)
    d = tmp_path / "frames" / "v1"
    d.mkdir(parents=True)
    for i in range(1, 61):
        cv2.imwrite(str(d / f"img_{i:05d}.jpg"),
                    rng.integers(0, 255, (48, 64, 3), np.uint8))
    ann = pd.DataFrame({
        "video_id": ["v1", "v1", "v1", "v1"],
        "start_frame": [0, 10, 20, 30],
        "stop_frame": [25, 40, 50, 58],
        "verb_class": [0, 1, 0, 1],
        "noun_class": [1, 0, 1, 0],
    })
    csv = tmp_path / "train.csv"
    ann.to_csv(csv, index=False)
    return tmp_path, csv


TINY = ["--input_size", "32", "--patch_size", "8", "--embed_dim", "16",
        "--depth", "1", "--num_heads", "2", "--num_frames", "4",
        "--tubelet_size", "2", "--num_verbs", "2", "--num_nouns", "2",
        "--epochs", "1", "--warmup_epochs", "0", "--batch_size", "2",
        "--compute_dtype", "float32"]


def test_pretrain_mode_runs_and_samples_randomly(clip_data, monkeypatch):
    tmp_path, csv = clip_data
    from tim_tpu.extract import clips, finetune_cli

    seen_modes = []
    orig = clips.EK100ClipDataset.__init__

    def spy(self, *a, **kw):
        seen_modes.append(kw.get("mode", "train"))
        return orig(self, *a, **kw)

    monkeypatch.setattr(clips.EK100ClipDataset, "__init__", spy)
    out = tmp_path / "pre_out"
    stats = finetune_cli.main([
        "--mode", "pretrain",
        "--anno_train", str(csv),
        "--data_path", str(tmp_path / "frames"),
        "--output_dir", str(out), "--mask_ratio", "0.75",
        *TINY])
    assert np.isfinite(stats["loss"])
    # the pretrain dataset must use random train-style sampling
    assert seen_modes == ["train"]
    assert os.path.exists(out / "checkpoint.msgpack")


def test_finetune_mode_runs(clip_data):
    tmp_path, csv = clip_data
    from tim_tpu.extract import finetune_cli

    out = tmp_path / "ft_out"
    stats = finetune_cli.main([
        "--mode", "finetune",
        "--anno_train", str(csv),
        "--data_path", str(tmp_path / "frames"),
        "--output_dir", str(out), "--num_sample", "1",
        *TINY])
    assert "verb_top1" in stats
