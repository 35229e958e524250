"""CLI smoke: reference-format files on disk -> validate + extract."""

import os

import numpy as np
import pytest

from tim_tpu import cli
from tim_tpu.data import synthetic


@pytest.fixture(scope="module")
def disk_bundle(tmp_path_factory):
    import pandas as pd

    tmp = tmp_path_factory.mktemp("clidata")
    b = synthetic.synthetic_epic(
        seed=11, num_videos=2, video_seconds=40.0, per_video=6,
        visual_dim=24, audio_dim=16, visual_classes=(5, 6, 4),
        audio_classes=3)

    for split in ("train", "val"):
        os.makedirs(tmp / "vfeats" / split, exist_ok=True)
        os.makedirs(tmp / "afeats" / split, exist_ok=True)
        for vid, arr in b["v_feats"].items():
            np.save(tmp / "vfeats" / split / f"{vid}.npy", arr)
        for vid, arr in b["a_feats"].items():
            np.save(tmp / "afeats" / split / f"{vid}.npy", arr)

    def ctx_frame(ft):
        rows = []
        for vid, t in ft.items():
            for s, e in t:
                rows.append({"video_id": vid, "start_sec": float(s),
                             "stop_sec": float(e), "narration_sec": float(s)})
        return pd.DataFrame(rows)

    ctx_frame(b["v_feat_times"]).to_pickle(tmp / "v_ctx.pkl")
    ctx_frame(b["a_feat_times"]).to_pickle(tmp / "a_ctx.pkl")
    b["v_actions"].to_pickle(tmp / "v_actions.pkl")
    b["a_actions"].to_pickle(tmp / "a_actions.pkl")
    b["video_info"].to_pickle(tmp / "video_info.pkl")
    return tmp


def _common_args(tmp, out):
    return [
        "--video_data_path", str(tmp / "vfeats"),
        "--audio_data_path", str(tmp / "afeats"),
        "--video_train_action_pickle", str(tmp / "v_actions.pkl"),
        "--video_val_action_pickle", str(tmp / "v_actions.pkl"),
        "--video_train_context_pickle", str(tmp / "v_ctx.pkl"),
        "--video_val_context_pickle", str(tmp / "v_ctx.pkl"),
        "--audio_train_action_pickle", str(tmp / "a_actions.pkl"),
        "--audio_val_action_pickle", str(tmp / "a_actions.pkl"),
        "--audio_train_context_pickle", str(tmp / "a_ctx.pkl"),
        "--audio_val_context_pickle", str(tmp / "a_ctx.pkl"),
        "--video_info_pickle", str(tmp / "video_info.pkl"),
        "--num_feats", "6", "--feat_stride", "2",
        "--d_model", "16", "--nhead", "2", "--num_layers", "1",
        "--visual_input_dim", "24", "--audio_input_dim", "16",
        "--compute_dtype", "float32",
        "--batch-size", "8",
        "--output_dir", str(out),
    ]


def test_cli_validate_and_extract(disk_bundle, tmp_path, monkeypatch):
    # class counts come from dataset presets; override via monkeypatch of
    # configs for the tiny synthetic label space
    import tim_tpu.cli as cli_mod

    orig = cli_mod.configs_from_args

    def patched(args):
        mcfg, tcfg, mesh = orig(args)
        import dataclasses
        mcfg = dataclasses.replace(mcfg, visual_classes=(5, 6, 4),
                                   audio_classes=3)
        return mcfg, tcfg, mesh

    monkeypatch.setattr(cli_mod, "configs_from_args", patched)

    cli.main(_common_args(disk_bundle, tmp_path) + ["--validate"])
    cli.main(_common_args(disk_bundle, tmp_path) + ["--extract_feats"])
    assert (tmp_path / "val_features.pkl").exists()


def test_cli_detection_validate(disk_bundle, tmp_path, monkeypatch):
    import tim_tpu.cli as cli_mod

    orig = cli_mod.configs_from_args

    def patched(args):
        mcfg, tcfg, mesh = orig(args)
        import dataclasses
        mcfg = dataclasses.replace(
            mcfg, visual_classes=(5,), audio_classes=3,
            train_query_size=0.1, inference_query_size=0.2)
        return mcfg, tcfg, mesh

    monkeypatch.setattr(cli_mod, "configs_from_args", patched)
    cli.main(_common_args(disk_bundle, tmp_path)
             + ["--variant", "detection", "--validate"])
    cli.main(_common_args(disk_bundle, tmp_path)
             + ["--variant", "detection", "--extract_feats"])
    assert (tmp_path / "dense_predictions.npz").exists()
    dense = np.load(tmp_path / "dense_predictions.npz", allow_pickle=True)
    assert dense["v_proposals"].shape[1] == 2
    # materialize before the next run overwrites the file (np.load is lazy)
    dense_action = np.array(dense["action"])
    dense.close()

    # top-k dump flag: ships <head>_topk_* columns instead of dense,
    # consistent with the dense dump's best classes
    cli.main(_common_args(disk_bundle, tmp_path)
             + ["--variant", "detection", "--extract_feats",
                "--extract_top_k", "2"])
    topk = np.load(tmp_path / "dense_predictions.npz", allow_pickle=True)
    assert topk["action_topk_values"].shape[-1] == 2
    assert "action" not in topk
    np.testing.assert_allclose(
        topk["action_topk_values"][:, 0],
        np.sort(dense_action, axis=-1)[:, -1], atol=1e-6)


def test_cli_loads_released_torch_checkpoint(disk_bundle, tmp_path,
                                             monkeypatch):
    """A reference-format checkpoint file (torch.save with 'state_dict',
    like the reference's save_checkpoint) loads through the CLI."""
    torch = pytest.importorskip("torch")
    import tim_tpu.cli as cli_mod
    from tests import torch_oracle

    orig = cli_mod.configs_from_args

    def patched(args):
        mcfg, tcfg, mesh = orig(args)
        import dataclasses
        mcfg = dataclasses.replace(mcfg, visual_classes=(5, 6, 4),
                                   audio_classes=3)
        return mcfg, tcfg, mesh

    monkeypatch.setattr(cli_mod, "configs_from_args", patched)

    torch.manual_seed(0)
    oracle = torch_oracle.OracleRecognitionAV(
        24, 16, 16, 2, 1, ((5, 6, 4), 3))
    ckpt_path = tmp_path / "released.pyth"
    torch.save({"state_dict": oracle.state_dict(), "epoch": 42},
               ckpt_path)

    cli.main(_common_args(disk_bundle, tmp_path)
             + ["--torch_checkpoint", str(ckpt_path), "--validate"])
