"""Metrics / meters / mAP golden tests vs the reference's own code."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from tim_tpu.evals.anet import (
    DetectionEvaluator, compute_average_precision_detection,
    interpolated_prec_rec, segment_iou)
from tim_tpu.evals.format_predictions import (
    evaluate_detections, gt_to_columns, threshold_predictions)
from tim_tpu.evals.meters import WindowVoteAccumulator
from tim_tpu.evals.metrics import multitask_accuracy, topk_accuracy


def _load_ref(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_topk_accuracy_matches_reference():
    torch = pytest.importorskip("torch")
    ref = _load_ref("/root/reference/recognition/time_interval_machine/"
                    "utils/metrics.py", "ref_metrics")
    rng = np.random.default_rng(0)
    scores = rng.normal(size=(50, 12)).astype(np.float32)
    labels = rng.integers(0, 12, 50)
    want = ref.accuracy(torch.tensor(scores), torch.tensor(labels))
    got = topk_accuracy(scores, labels)
    assert got[0] == pytest.approx(want[0], abs=1e-4)
    assert got[1] == pytest.approx(want[1], abs=1e-4)


def test_multitask_accuracy_matches_reference():
    torch = pytest.importorskip("torch")
    ref = _load_ref("/root/reference/recognition/time_interval_machine/"
                    "utils/metrics.py", "ref_metrics")
    rng = np.random.default_rng(1)
    v = rng.normal(size=(40, 9)).astype(np.float32)
    n = rng.normal(size=(40, 11)).astype(np.float32)
    vl = rng.integers(0, 9, 40)
    nl = rng.integers(0, 11, 40)
    want = ref.multitask_accuracy(
        (torch.tensor(v), torch.tensor(n)),
        (torch.tensor(vl), torch.tensor(nl)))
    got = multitask_accuracy((v, n), (vl, nl))
    assert got[0] == pytest.approx(want[0], abs=1e-4)
    assert got[1] == pytest.approx(want[1], abs=1e-4)


def test_window_vote_matches_reference_mechanic():
    """sum logits per action / seen-count -> softmax -> accuracy, with the
    seen-count shared between modalities (meters.py:490-599)."""
    rng = np.random.default_rng(2)
    num_actions, c = 10, 5
    acc = WindowVoteAccumulator(num_actions, {"action": c, "audio": 4})

    sums = np.zeros((num_actions, c))
    seen = np.zeros(num_actions)
    labels_ref = -np.ones(num_actions, np.int64)

    for _ in range(6):
        ids = rng.integers(0, num_actions, (2, 3))
        logits = rng.normal(size=(2, 3, c)).astype(np.float32)
        labels = rng.integers(0, c, (2, 3))
        acc.update({"action": logits}, ids, None,
                   {"verb": labels, "noun": labels, "action": labels})
        np.add.at(sums, ids.reshape(-1), logits.reshape(-1, c))
        np.add.at(seen, ids.reshape(-1), 1.0)
        labels_ref[ids.reshape(-1)] = labels.reshape(-1)

    scores, labels = acc.ensembled_scores("action")
    valid = labels_ref != -1
    mean_logits = sums[valid] / seen[valid][:, None]
    want = np.exp(mean_logits - mean_logits.max(-1, keepdims=True))
    want = want / want.sum(-1, keepdims=True)
    np.testing.assert_allclose(scores, want, atol=1e-6)
    np.testing.assert_array_equal(labels, labels_ref[valid])


def test_ap_matches_reference_evaluator():
    """Golden test vs the reference's compute_average_precision_detection
    on random predictions."""
    pd = pytest.importorskip("pandas")
    ref = _load_ref("/root/reference/detection/eval_detection/"
                    "evaluate_detection_json_ek100.py", "ref_eval")

    rng = np.random.default_rng(3)
    n_gt, n_pred = 25, 80
    vids = np.asarray([f"v{i % 4}" for i in range(n_gt)], object)
    gs = rng.uniform(0, 50, n_gt)
    ge = gs + rng.uniform(0.5, 5, n_gt)

    pv = np.asarray([f"v{i % 5}" for i in range(n_pred)], object)  # v4 = fp
    ps = rng.uniform(0, 50, n_pred)
    pe = ps + rng.uniform(0.5, 6, n_pred)
    scores = rng.uniform(0, 1, n_pred)

    tious = np.linspace(0.1, 0.5, 5)
    gt_df = pd.DataFrame({
        "video-id": vids, "t-start": gs, "t-end": ge,
        "narration": [f"n{i}" for i in range(n_gt)]})
    pred_df = pd.DataFrame({
        "video-id": pv, "t-start": ps, "t-end": pe, "score": scores,
        "verb": 0, "noun": 0})
    want, _ = ref.compute_average_precision_detection(gt_df, pred_df,
                                                      tious)

    got = compute_average_precision_detection(
        vids, np.stack([gs, ge], -1), pv, np.stack([ps, pe], -1), scores,
        tious)
    np.testing.assert_allclose(got, want, atol=1e-9)


@pytest.mark.parametrize("seed,n_gt,n_pred", [(11, 5, 9), (12, 60, 200),
                                              (13, 1, 50)])
def test_ap_fuzz_matches_reference(seed, n_gt, n_pred):
    """More AP golden configs: tiny, dense, single-GT; includes duplicate
    segments and out-of-video predictions."""
    pd = pytest.importorskip("pandas")
    ref = _load_ref("/root/reference/detection/eval_detection/"
                    "evaluate_detection_json_ek100.py", f"ref_eval_{seed}")

    rng = np.random.default_rng(seed)
    vids = np.asarray([f"v{i % 3}" for i in range(n_gt)], object)
    gs = rng.uniform(0, 30, n_gt)
    ge = gs + rng.uniform(0.5, 4, n_gt)

    pv = np.asarray([f"v{i % 4}" for i in range(n_pred)], object)
    ps = rng.uniform(0, 30, n_pred)
    pe = ps + rng.uniform(0.5, 5, n_pred)
    # force some exact-duplicate predictions
    if n_pred > 4:
        ps[1], pe[1], pv[1] = ps[0], pe[0], pv[0]
    scores = rng.uniform(0, 1, n_pred)

    tious = np.linspace(0.1, 0.5, 5)
    gt_df = pd.DataFrame({"video-id": vids, "t-start": gs, "t-end": ge,
                          "narration": [f"n{i}" for i in range(n_gt)]})
    pred_df = pd.DataFrame({"video-id": pv, "t-start": ps, "t-end": pe,
                            "score": scores, "verb": 0, "noun": 0})
    want, _ = ref.compute_average_precision_detection(gt_df, pred_df,
                                                      tious)
    got = compute_average_precision_detection(
        vids, np.stack([gs, ge], -1), pv, np.stack([ps, pe], -1), scores,
        tious)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_ap_zero_length_pair_matches_reference():
    """Degenerate zero-length prediction on zero-length GT: IoU = 0/0 =
    NaN, and the reference's walk does NOT break on NaN (`NaN < thr` is
    False) so it credits a true positive. The vectorized gate must use
    the same negated condition (caught round 5: `iou >= thr` silently
    turned these into false positives)."""
    pd = pytest.importorskip("pandas")
    ref = _load_ref("/root/reference/detection/eval_detection/"
                    "evaluate_detection_json_ek100.py", "ref_eval_nan")

    vids = np.asarray(["v0", "v0"], object)
    gs = np.asarray([5.0, 10.0])
    ge = np.asarray([5.0, 12.0])          # first GT is zero-length
    pv = np.asarray(["v0", "v0", "v0"], object)
    ps = np.asarray([5.0, 10.5, 20.0])
    pe = np.asarray([5.0, 11.5, 21.0])    # first pred zero-length on GT
    scores = np.asarray([0.9, 0.8, 0.7])

    tious = np.linspace(0.1, 0.5, 5)
    gt_df = pd.DataFrame({"video-id": vids, "t-start": gs, "t-end": ge,
                          "narration": ["n0", "n1"]})
    pred_df = pd.DataFrame({"video-id": pv, "t-start": ps, "t-end": pe,
                            "score": scores, "verb": 0, "noun": 0})
    want, _ = ref.compute_average_precision_detection(gt_df, pred_df,
                                                      tious)
    got = compute_average_precision_detection(
        vids, np.stack([gs, ge], -1), pv, np.stack([ps, pe], -1), scores,
        tious)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_interpolated_prec_rec_matches_reference():
    ref = _load_ref("/root/reference/detection/eval_detection/"
                    "evaluate_detection_json_ek100.py", "ref_eval2")
    rng = np.random.default_rng(4)
    prec = rng.uniform(0, 1, 30)
    rec = np.sort(rng.uniform(0, 1, 30))
    assert interpolated_prec_rec(prec, rec) == pytest.approx(
        ref.interpolated_prec_rec(prec, rec), abs=1e-12)


def test_end_to_end_detection_eval_perfect_predictions():
    """Perfect proposals at high score -> avg mAP 1.0."""
    rng = np.random.default_rng(5)
    n = 12
    vids = np.asarray([f"v{i % 3}" for i in range(n)], object)
    starts = rng.uniform(0, 40, n)
    ends = starts + rng.uniform(1, 4, n)
    labels = rng.integers(0, 4, n)

    scores = np.full((n, 4), 0.001, np.float32)
    scores[np.arange(n), labels] = 0.9

    m_ap, avg, submission = evaluate_detections(
        vids, np.stack([starts, ends], -1), scores,
        gt_to_columns(vids, starts, ends, labels))
    assert avg == pytest.approx(1.0)
    assert len(submission["results"]) == 3


def test_ek100_evaluation_matches_reference_anetdetection():
    """End-to-end golden: annotations pickle schema + challenge submission
    through the reference ANETdetection class vs our evaluate_ek100, all
    three tasks."""
    pd = pytest.importorskip("pandas")
    ref = _load_ref("/root/reference/detection/eval_detection/"
                    "evaluate_detection_json_ek100.py", "ref_eval3")
    from tim_tpu.evals.ek100 import evaluate_ek100

    rng = np.random.default_rng(7)
    n_gt = 40

    def fmt(sec):
        h = int(sec // 3600); m = int((sec % 3600) // 60); s = sec % 60
        return f"{h:02d}:{m:02d}:{s:09.6f}"

    gstarts = rng.uniform(0, 60, n_gt)
    ann = pd.DataFrame({
        "video_id": [f"P{i % 3}" for i in range(n_gt)],
        "start_timestamp": [fmt(s) for s in gstarts],
        "stop_timestamp": [fmt(s + rng.uniform(1, 5)) for s in gstarts],
        "verb_class": rng.integers(0, 4, n_gt),
        "noun_class": rng.integers(0, 5, n_gt),
    }, index=pd.Index([f"n{i}" for i in range(n_gt)],
                      name="narration_id"))

    results = {}
    for i in range(120):
        vid = f"P{rng.integers(0, 4)}"  # P3 = pure false positives
        s = float(rng.uniform(0, 60))
        v, n = int(rng.integers(0, 4)), int(rng.integers(0, 5))
        results.setdefault(vid, []).append({
            "verb": v, "noun": n, "action": f"{v},{n}",
            "score": float(rng.uniform(0, 1)),
            "segment": [round(s, 3), round(s + float(rng.uniform(1, 6)),
                                           3)],
        })
    submission = {"version": "0.2", "challenge": "action_detection",
                  "sls_pt": 2, "sls_tl": 3, "sls_td": 4,
                  "results": results}

    for task in ("verb", "noun", "action"):
        ref_eval = ref.ANETdetection(ann, submission, label=task,
                                     num_nouns=5)
        want_map, want_avg = ref_eval.evaluate(task)
        got_map, got_avg = evaluate_ek100(ann, submission, task,
                                          num_nouns=5)
        np.testing.assert_allclose(got_map, want_map, atol=1e-9,
                                   err_msg=task)
        assert got_avg == pytest.approx(want_avg, abs=1e-9)


def test_validate_submission():
    from tim_tpu.evals.format_predictions import (
        SubmissionError, validate_submission)

    good = {
        "version": "0.2", "challenge": "action_detection",
        "results": {"v1": [{"action": 2, "score": 0.5,
                            "segment": [1.0, 2.0]}]},
    }
    validate_submission(good, num_classes=5, video_ids=["v1"])

    with pytest.raises(SubmissionError, match="Missing 'version'"):
        validate_submission({"challenge": "x", "results": {}})
    with pytest.raises(SubmissionError, match="not supported"):
        validate_submission({**good, "version": "9.9"})
    bad_seg = {**good, "results": {"v1": [
        {"action": 2, "score": 0.5, "segment": [2.0, 1.0]}]}}
    with pytest.raises(SubmissionError, match="Invalid segment"):
        validate_submission(bad_seg)
    bad_cls = {**good, "results": {"v1": [
        {"action": 9, "score": 0.5, "segment": [1.0, 2.0]}]}}
    with pytest.raises(SubmissionError, match="invalid action class"):
        validate_submission(bad_cls, num_classes=5)
    with pytest.raises(SubmissionError, match="Missing results"):
        validate_submission(good, video_ids=["v1", "v2"])


def test_threshold_predictions_drops_empty_and_expands_multilabel():
    vids = np.asarray(["a", "a", "b"], object)
    props = np.asarray([[0, 1], [2, 2], [3, 5]], np.float32)
    scores = np.asarray([[0.5, 0.2, 0.01], [0.9, 0.9, 0.9],
                         [0.04, 0.01, 0.01]], np.float32)
    out = threshold_predictions(vids, props, scores, 0.03)
    assert len(out["a"]["labels"]) == 2      # zero-length row dropped
    assert set(out["a"]["labels"].tolist()) == {0, 1}
    assert len(out["b"]["labels"]) == 1


def test_file_level_chain_through_reference_main(tmp_path, capsys):
    """Full file-level interop: a dense dump evaluated by our CLI
    (python -m tim_tpu.evals) writes the official triplet challenge
    JSON, and the reference evaluate_detection_json_ek100.py main() —
    executed in-process on the files — produces identical mAP for all
    three tasks. (The reference's own formatter writes single-task int
    entries its evaluator cannot parse; the triplet format is the
    challenge contract.)"""
    import argparse
    import json

    pd = pytest.importorskip("pandas")
    ref = _load_ref("/root/reference/detection/eval_detection/"
                    "evaluate_detection_json_ek100.py", "ref_eval_main")
    from tim_tpu.evals.__main__ import main as evals_main

    rng = np.random.default_rng(21)
    n_verbs, n_nouns = 4, 5
    n_gt, n_prop = 30, 150

    def fmt(sec):
        h = int(sec // 3600); m = int((sec % 3600) // 60); s = sec % 60
        return f"{h:02d}:{m:02d}:{s:09.6f}"

    gstarts = rng.uniform(0, 60, n_gt)
    ann = pd.DataFrame({
        "video_id": [f"P{i % 3}" for i in range(n_gt)],
        "start_timestamp": [fmt(s) for s in gstarts],
        "stop_timestamp": [fmt(s + rng.uniform(1, 5)) for s in gstarts],
        "verb_class": rng.integers(0, n_verbs, n_gt),
        "noun_class": rng.integers(0, n_nouns, n_gt),
    }, index=pd.Index([f"n{i}" for i in range(n_gt)],
                      name="narration_id"))
    gt_pkl = tmp_path / "gt.pkl"
    ann.to_pickle(gt_pkl)

    starts = rng.uniform(0, 60, n_prop)
    dump = tmp_path / "dense_predictions.npz"
    np.savez(dump,
             video_ids=np.asarray([f"P{i % 3}" for i in range(n_prop)],
                                  object),
             v_proposals=np.stack(
                 [starts, starts + rng.uniform(0.5, 6, n_prop)], -1),
             action=rng.uniform(0, 0.6, (n_prop, n_verbs * n_nouns)))

    challenge_json = tmp_path / "challenge.json"
    result = evals_main([
        "--dump", str(dump), "--gt", str(gt_pkl), "--task", "action",
        "--noun_count", str(n_nouns),
        "--challenge_json", str(challenge_json),
    ])
    capsys.readouterr()
    assert challenge_json.exists()

    # reference main() on the files, metrics captured via print_metrics
    captured = {}
    ref.print_metrics = captured.update
    ref.main(argparse.Namespace(
        path_to_json=str(challenge_json), path_to_annotations=gt_pkl,
        task="all", noun_count=n_nouns, verb_count=n_verbs))
    capsys.readouterr()

    # our action-task CLI avg must equal the reference main()'s
    assert result["avg_mAP"] * 100 == pytest.approx(
        captured["action_map_avg"], abs=1e-9)
    # and verb/noun evaluated from the same files match evaluate_ek100
    from tim_tpu.evals.ek100 import evaluate_ek100
    with open(challenge_json) as f:
        submission = json.load(f)
    for task in ("verb", "noun", "action"):
        _, avg = evaluate_ek100(ann, submission, task, num_nouns=n_nouns)
        assert avg * 100 == pytest.approx(
            captured[f"{task}_map_avg"], abs=1e-9), task
    for sls in ("sls_pt", "sls_tl", "sls_td"):
        assert sls in captured


def test_evals_cli_audio_task(tmp_path, capsys):
    """EPIC-Sounds-style audio detection through the file CLI: generic
    second-valued GT pickle + a_proposals/audio dump -> Soft-NMS ->
    audio_based_interaction_detection submission -> mAP."""
    pd = pytest.importorskip("pandas")
    from tim_tpu.evals.__main__ import main as evals_main

    rng = np.random.default_rng(31)
    n_gt, n_prop, n_cls = 20, 90, 6
    gs = rng.uniform(0, 40, n_gt)
    ann = pd.DataFrame({
        "video_id": [f"P{i % 2}" for i in range(n_gt)],
        "start_seconds": gs,
        "stop_seconds": gs + rng.uniform(0.5, 3, n_gt),
        "class_id": rng.integers(0, n_cls, n_gt),
    })
    gt_pkl = tmp_path / "sounds_gt.pkl"
    ann.to_pickle(gt_pkl)
    starts = rng.uniform(0, 40, n_prop)
    dump = tmp_path / "dump.npz"
    np.savez(dump,
             video_ids=np.asarray([f"P{i % 2}" for i in range(n_prop)],
                                  object),
             a_proposals=np.stack(
                 [starts, starts + rng.uniform(0.5, 4, n_prop)], -1),
             audio=rng.uniform(0, 0.6, (n_prop, n_cls)))
    sub = tmp_path / "audio_sub.json"
    result = evals_main([
        "--dump", str(dump), "--gt", str(gt_pkl),
        "--task", "audio", "--dataset", "epic_sounds",
        "--submission", str(sub),
    ])
    capsys.readouterr()
    assert 0.0 <= result["avg_mAP"] <= 1.0
    assert len(result["mAP"]) == 5
    import json
    with open(sub) as f:
        s = json.load(f)
    assert s["challenge"] == "audio_based_interaction_detection"
    assert all("audio" in e for v in s["results"].values() for e in v)
