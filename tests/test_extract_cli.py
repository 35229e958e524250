"""End-to-end extraction CLI on synthetic frames/audio with tiny random
backbones (no checkpoint): produces banks the FeatureStore can read, plus
two-stream fusion coverage."""

import os

import numpy as np
import pytest


def _write_frames(tmp, vid, n=30, size=64):
    from PIL import Image
    d = tmp / "frames" / vid
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, (size, size, 3),
                                     dtype=np.uint8)).save(
            d / f"frame_{i:010d}.jpg")


def test_extract_cli_audio(tmp_path):
    import pandas as pd
    from scipy.io import wavfile

    from tim_tpu.extract import cli
    from tim_tpu.extract.tables import build_feature_time_table

    sr = 24000
    os.makedirs(tmp_path / "audio", exist_ok=True)
    rng = np.random.default_rng(0)
    wavfile.write(tmp_path / "audio" / "v1.wav", sr,
                  (rng.normal(size=sr * 4) * 0.1).astype(np.float32))
    table = build_feature_time_table({"v1": 4.0}, interval=1.1, hop=0.5)
    table.to_pickle(tmp_path / "ctx.pkl")

    cli.main([
        "--backbone", "slowfast",
        "--audio_dir", str(tmp_path / "audio"),
        "--feature_times", str(tmp_path / "ctx.pkl"),
        "--out_dir", str(tmp_path / "feats"),
        "--split", "val", "--num_aug", "2", "--batch_size", "4",
    ])
    bank = np.load(tmp_path / "feats" / "val" / "v1.npy")
    assert bank.shape == (len(table), 2, 2304)
    assert np.isfinite(bank).all()


def test_extract_cli_visual_videomae(tmp_path, monkeypatch):
    from tim_tpu.extract import cli
    from tim_tpu.extract.tables import build_feature_time_table
    from tim_tpu.models.backbones import vit

    _write_frames(tmp_path, "v1", n=40)
    table = build_feature_time_table({"v1": 1.6}, interval=1.1, hop=0.4,
                                     fps=25.0)
    table.to_pickle(tmp_path / "ctx.pkl")

    # shrink the backbone: the CLI path (frame IO, sampling, preprocessing,
    # batching, saving) is what's under test, not ViT-L throughput
    monkeypatch.setattr(
        vit, "videomae_vit_large",
        lambda dtype="float32", use_flash=False, quantized=False:
        vit.VideoMAEViT(embed_dim=1024, depth=1, num_heads=4,
                        quantized=quantized))
    cli.main([
        "--backbone", "videomae",
        "--frames_dir", str(tmp_path / "frames"),
        "--feature_times", str(tmp_path / "ctx.pkl"),
        "--out_dir", str(tmp_path / "feats"),
        "--split", "val", "--num_aug", "1", "--batch_size", "1",
        "--num_frames", "16", "--fps", "25",
    ])
    bank = np.load(tmp_path / "feats" / "val" / "v1.npy")
    assert bank.shape[-1] == 1024

    # dynamic-int8 path (--quantize_backbone on): same pipeline, features
    # close to the fp path (random init; the bound pins wiring, not quality)
    cli.main([
        "--backbone", "videomae",
        "--frames_dir", str(tmp_path / "frames"),
        "--feature_times", str(tmp_path / "ctx.pkl"),
        "--out_dir", str(tmp_path / "feats_q"),
        "--split", "val", "--num_aug", "1", "--batch_size", "1",
        "--num_frames", "16", "--fps", "25",
        "--quantize_backbone", "on",
    ])
    bank_q = np.load(tmp_path / "feats_q" / "val" / "v1.npy")
    assert bank_q.shape == bank.shape
    denom = np.abs(bank).max()
    assert np.abs(bank_q - bank).max() / denom < 0.05


def test_two_stream_fusion():
    from tim_tpu.evals.format_predictions import two_stream_fusion

    vids = np.asarray(["a", "a"], object)
    verb_scores = np.asarray([[0.9, 0.01], [0.02, 0.02]], np.float32)
    noun_scores = np.asarray([[0.01, 0.8, 0.01], [0.01, 0.01, 0.02]],
                             np.float32)
    v_props = np.asarray([[1.0, 2.0], [5.0, 6.0]], np.float32)
    n_props = np.asarray([[1.2, 2.2], [5.0, 6.0]], np.float32)

    out = two_stream_fusion(vids, verb_scores, noun_scores, v_props,
                            n_props, top_k=2, num_nouns=3)
    assert "a" in out
    e = out["a"]
    # only proposal 0 passes thresholds; action label verb0 * 3 + noun1 = 1
    assert e["labels"].tolist() == [1]
    want_score = (0.9 ** 0.65) * (0.8 ** 0.35)
    assert e["scores"][0] == pytest.approx(want_score, rel=1e-5)
    w = 0.9 / (0.9 + 0.8)
    np.testing.assert_allclose(
        e["segments"][0], np.round(w * v_props[0] + (1 - w) * n_props[0], 3),
        atol=1e-5)
