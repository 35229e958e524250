"""Challenge-scale detection eval-chain benchmark (host CPU).

Fabricates an EK100-challenge-sized top-k dense dump (646 windows x 798
queries = 515,508 proposals, 3806 classes, device top-k=32 per proposal,
score threshold 0.03 -> ~2-3 surviving classes/proposal, i.e. ~1.3M
candidate (proposal, class) pairs) and times the full host-side chain the
reference fans over 32 processes
(``format_predictions_epic.py:146``, ``evaluate_detection_json_ek100.py:126``):

    threshold -> per-video multi-class Soft-NMS -> submission dict ->
    columns -> per-class greedy-matching mAP

Prints one wall-time line per stage plus the end-to-end total, so the
dominating stage is unambiguous before any vectorization work.

Usage:  python scripts/bench_eval_chain.py [--small] [--n_jobs N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tim_tpu.evals.anet import DetectionEvaluator
from tim_tpu.evals.format_predictions import (
    build_submission,
    gt_to_columns,
    nms_per_video,
    submission_to_columns,
    threshold_predictions_topk,
)

NUM_CLASSES = 3806
TOP_K = 32


def _zipf_probs(n_classes: int, offset: float = 10.0) -> np.ndarray:
    p = 1.0 / (np.arange(n_classes) + offset)
    return p / p.sum()


def fabricate_dump(seed: int = 0, n_windows: int = 646, n_queries: int = 798,
                   n_videos: int = 26, video_len: float = 600.0):
    """Synthetic dump shaped like extract_dense_predictions' output:
    (video_ids [N], proposals [N,2], topk_values [N,k], topk_classes [N,k])
    plus GT columns at EK100-val scale (~10k segments)."""
    rng = np.random.default_rng(seed)
    n = n_windows * n_queries

    # windows spread contiguously over videos, proposals inside the window
    win_video = np.repeat(np.arange(n_windows) % n_videos, n_queries)
    video_ids = np.array([f"P{v // 4:02d}_{v % 4:02d}" for v in win_video],
                         dtype=object)
    starts = rng.uniform(0.0, video_len - 35.0, n)
    lengths = np.exp(rng.uniform(np.log(0.1), np.log(30.0), n))
    proposals = np.stack([starts, starts + lengths], axis=-1)

    # top-k scores: exp(scale=0.012) -> P(>0.03)=e^-2.5, ~2.6 survivors/row
    vals = rng.exponential(0.012, (n, TOP_K)).astype(np.float32)
    vals = np.sort(vals, axis=-1)[:, ::-1]
    np.clip(vals, 0.0, 0.999, out=vals)
    probs = _zipf_probs(NUM_CLASSES)
    classes = rng.choice(NUM_CLASSES, size=(n, TOP_K), p=probs)

    # GT: ~10k segments over the same videos, same class skew
    n_gt = 10_000
    gt_vid_idx = rng.integers(0, n_videos, n_gt)
    gt_vids = np.array([f"P{v // 4:02d}_{v % 4:02d}" for v in gt_vid_idx],
                       dtype=object)
    gt_start = rng.uniform(0.0, video_len - 10.0, n_gt)
    gt_len = np.exp(rng.uniform(np.log(0.3), np.log(20.0), n_gt))
    gt_labels = rng.choice(NUM_CLASSES, size=n_gt, p=probs)
    gt = gt_to_columns(gt_vids, gt_start, gt_start + gt_len, gt_labels)
    return video_ids, proposals, vals, classes, gt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="1/16-size smoke run")
    ap.add_argument("--n_jobs", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    n_windows = 40 if args.small else 646
    t0 = time.perf_counter()
    video_ids, proposals, vals, classes, gt = fabricate_dump(
        seed=args.seed, n_windows=n_windows)
    print(f"fabricate: {time.perf_counter() - t0:8.2f} s   "
          f"({len(proposals):,} proposals, {len(gt['label']):,} GT)")

    times = {}

    t0 = time.perf_counter()
    cands = threshold_predictions_topk(
        video_ids, proposals, vals, classes, score_threshold=0.03,
        num_classes=NUM_CLASSES)
    times["threshold"] = time.perf_counter() - t0
    n_cand = sum(len(e["scores"]) for e in cands.values())
    print(f"threshold: {times['threshold']:8.2f} s   "
          f"({n_cand:,} candidates over {len(cands)} videos)")

    t0 = time.perf_counter()
    dets = nms_per_video(cands, iou_threshold=0.1, sigma=0.25,
                         n_jobs=args.n_jobs)
    times["soft-nms"] = time.perf_counter() - t0
    n_det = sum(len(e["scores"]) for e in dets.values())
    print(f"soft-nms:  {times['soft-nms']:8.2f} s   "
          f"({n_det:,} detections kept)")

    t0 = time.perf_counter()
    submission = build_submission(dets)
    times["submission"] = time.perf_counter() - t0
    print(f"submission:{times['submission']:8.2f} s")

    t0 = time.perf_counter()
    pred_cols = submission_to_columns(submission)
    times["columns"] = time.perf_counter() - t0
    print(f"columns:   {times['columns']:8.2f} s")

    t0 = time.perf_counter()
    evaluator = DetectionEvaluator(gt, pred_cols, n_jobs=args.n_jobs)
    m_ap, avg, _ = evaluator.evaluate()
    times["mAP"] = time.perf_counter() - t0
    print(f"mAP:       {times['mAP']:8.2f} s   (avg mAP {avg:.4f}, "
          f"{len(evaluator.labels)} classes)")

    total = sum(times.values())
    print(f"TOTAL:     {total:8.2f} s   "
          f"(dominant: {max(times, key=times.get)})")


if __name__ == "__main__":
    main()
