"""Characterize the int8 serving-accuracy contract margin across fixture
re-rolls (VERDICT r3 task 4).

The contract (tests/test_quant_accuracy.py::test_detection_int8_mAP_delta)
bounds avg-mAP DEGRADATION at 2% relative (0.005 absolute floor) for the
int8-static path and the int8+fast_scores headline, measured on ONE
trained fixture. This script re-trains that exact fixture under several
(data seed, train seed) rolls and prints the degradation distribution, so
the bound is backed by a measured spread instead of a single draw.

Run: python scripts/characterize_quant_margin.py [--seeds 11 21 31 41]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def build_and_train(data_seed: int, train_seed: int):
    import jax

    from tim_tpu import config as C
    from tim_tpu.data import synthetic
    from tim_tpu.data.dataset import DetectionDataset, FeatureStore
    from tim_tpu.data.windows import (
        build_detection_windows, normalize_actions)
    from tim_tpu.runner import DetectionRunner

    b = synthetic.synthetic_epic(
        seed=data_seed, num_videos=2, video_seconds=40.0, per_video=8,
        visual_dim=24, audio_dim=16, visual_classes=(4,), audio_classes=3)
    num_feats = 8
    window_size = num_feats * 2 * 0.2
    v_norm = normalize_actions(b["v_actions"], "visual", detection=True,
                               window_size=window_size)
    a_norm = normalize_actions(b["a_actions"], "audio", detection=True,
                               window_size=window_size)
    for _, row in v_norm.iterrows():
        times = b["v_feat_times"][row.video_id][:, :2].mean(1)
        inside = (times >= row.start_sec) & (times <= row.stop_sec)
        cls = int(row.action_class)
        b["v_feats"][row.video_id][inside, :, cls * 5:cls * 5 + 4] += 3.0
    ws = build_detection_windows(
        v_norm, a_norm, b["video_info"], b["v_feat_times"],
        num_feats=num_feats, feat_stride=2, feat_gap=0.2)
    v1 = {k: v[:, :1] for k, v in b["v_feats"].items()}
    a1 = {k: v[:, :1] for k, v in b["a_feats"].items()}
    ds = DetectionDataset(
        ws, FeatureStore(v1, b["v_feat_times"]),
        FeatureStore(a1, b["a_feat_times"]), sample_augmentations=False,
        include_verb_noun=False, dataset_name="synthetic")
    cfg = C.DetectionConfig(
        visual_classes=(4,), audio_classes=3,
        visual_input_dim=24, audio_input_dim=16, d_model=16, nhead=2,
        num_layers=2, num_feats=num_feats, compute_dtype="float32",
        train_query_size=0.05, inference_query_size=0.1)
    tcfg = C.TrainConfig(batch_size=8, epochs=15, warmup_epochs=0, lr=3e-3,
                         lambda_drloc=0.0, normaliser_init=30.0,
                         mixup_alpha=0.0)
    runner = DetectionRunner(cfg, tcfg, ds, ds, print_freq=10 ** 9)
    runner.init_state(rng=jax.random.PRNGKey(train_seed))
    rng = jax.random.PRNGKey(train_seed)
    for epoch in range(tcfg.epochs):
        runner.train_epoch(epoch, rng)
    return b, cfg, runner


def eval_maps(b, cfg, runner):
    import jax

    from tim_tpu.data.windows import timestamp_to_seconds
    from tim_tpu.evals.anet import DetectionEvaluator
    from tim_tpu.evals.format_predictions import gt_to_columns
    from tim_tpu.serve import DetectionServer

    params = jax.device_get(runner.state.params)
    kw = dict(feat_stride=2, feat_gap=0.2, batch_size=16)
    servers = {
        "fp32": DetectionServer(cfg, params, **kw),
        "int8": DetectionServer.quantized(cfg, params, [None], **kw),
        "headline": DetectionServer.quantized(
            dataclasses.replace(cfg, fast_scores=True), params, [None],
            **kw),
    }
    gt = b["v_actions"]
    gt_cols = gt_to_columns(
        gt["video_id"].to_numpy(object),
        gt["start_timestamp"].apply(timestamp_to_seconds).to_numpy(float),
        gt["stop_timestamp"].apply(timestamp_to_seconds).to_numpy(float),
        gt["action_class"].to_numpy())
    maps = {}
    for tag, server in servers.items():
        vids, starts, ends, labels, scores = [], [], [], [], []
        for vid, dur in b["durations"].items():
            out = server.detect_video(
                b["v_feats"][vid][:, 0], b["a_feats"][vid][:, 0],
                b["v_feat_times"][vid], dur, score_threshold=0.005)
            vids.extend([vid] * len(out["scores"]))
            starts.extend(out["segments"][:, 0])
            ends.extend(out["segments"][:, 1])
            labels.extend(out["labels"])
            scores.extend(out["scores"])
        pred_cols = {
            "video-id": np.asarray(vids, object),
            "t-start": np.asarray(starts, float),
            "t-end": np.asarray(ends, float),
            "label": np.asarray(labels),
            "score": np.asarray(scores, float),
        }
        _, avg, _ = DetectionEvaluator(gt_cols, pred_cols).evaluate()
        maps[tag] = float(avg)
    return maps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+",
                    default=[11, 21, 31, 41])
    args = ap.parse_args()
    import jax
    if jax.default_backend() != "cpu":
        jax.config.update("jax_platforms", "cpu")

    rows = []
    for seed in args.seeds:
        t0 = time.time()
        b, cfg, runner = build_and_train(seed, seed)
        maps = eval_maps(b, cfg, runner)
        rel = {t: (maps["fp32"] - maps[t]) / max(maps["fp32"], 1e-9)
               for t in ("int8", "headline")}
        rows.append((seed, maps, rel))
        print(f"[margin] seed {seed}: fp32 {maps['fp32']:.4f} "
              f"int8 {maps['int8']:.4f} (rel degr {rel['int8']:+.4f}) "
              f"headline {maps['headline']:.4f} "
              f"(rel degr {rel['headline']:+.4f}) "
              f"[{time.time() - t0:.0f}s]", flush=True)

    for tag in ("int8", "headline"):
        degr = [r[2][tag] for r in rows]
        print(f"[margin] {tag}: rel degradation over {len(degr)} seeds "
              f"min {min(degr):+.4f} max {max(degr):+.4f} "
              f"mean {np.mean(degr):+.4f} (contract bound +0.02)",
              flush=True)


if __name__ == "__main__":
    main()
