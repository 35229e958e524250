"""Serving API: untrimmed-video action detection in one call.

Production path for deployed TIM detection: given per-timestep feature
banks for one (or many) videos, slide fixed windows, score the dense query
pyramid on device in fixed-size batches, then threshold + per-video
Soft-NMS (native kernel) into final detections. The reference requires
three programs and two file formats for this; here it is

    server = DetectionServer(cfg, params)
    detections = server.detect_video(v_feats, a_feats, feat_times, duration)
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from tim_tpu.config import DetectionConfig
from tim_tpu.data.windows import window_feat_indices
from tim_tpu.evals.format_predictions import (
    nms_per_video, threshold_predictions)
from tim_tpu.models import TimDetection
from tim_tpu.models.queries import generate_query_pyramid
from tim_tpu.train.detection import make_inference_step


class DetectionServer:
    def __init__(
        self,
        cfg: DetectionConfig,
        params,
        *,
        feat_stride: int = 3,
        feat_gap: float = 0.2,
        window_stride: float = 1.0,
        batch_size: int = 128,
    ):
        self.cfg = cfg
        self.params = params
        self.feat_stride = feat_stride
        self.window_stride = window_stride
        self.window_size = cfg.num_feats * feat_gap * feat_stride
        self.batch_size = batch_size
        self.model = TimDetection(cfg)
        self._infer = jax.jit(make_inference_step(self.model, cfg))
        self.num_queries = generate_query_pyramid(
            cfg.inference_query_size).shape[0]

    # ------------------------------------------------------------------
    def _window_starts(self, duration: float) -> np.ndarray:
        dur = math.ceil(duration)
        n = max(math.ceil((dur - self.window_size)
                          / self.window_stride) + 1, 1)
        return self.window_stride * np.arange(n)

    def _assemble(self, feats, feat_times, starts, kind):
        nf = self.cfg.num_feats
        idx = np.stack([
            window_feat_indices(feat_times, s,
                                min(s + self.window_size,
                                    feat_times[-1, 1]),
                                self.feat_stride, nf)
            for s in starts])
        data = feats[idx]                                  # [B, F, D]
        times = feat_times[idx][:, :, :2]
        times = np.clip((times - starts[:, None, None])
                        / self.window_size, 0.0, None)
        return data.astype(np.float32), times.astype(np.float32)

    # ------------------------------------------------------------------
    def detect_video(
        self,
        v_feats: Optional[np.ndarray],      # [T, Dv] (aug already chosen)
        a_feats: Optional[np.ndarray],      # [T, Da]
        feat_times: np.ndarray,             # [T, >=2]
        duration: float,
        *,
        score_threshold: float = 0.03,
        nms_sigma: float = 0.25,
        nms_iou: float = 0.1,
        modality: str = "visual",           # which score head to report
    ) -> Dict[str, np.ndarray]:
        """Returns {"segments" [N, 2] video-time, "scores" [N],
        "labels" [N]} after Soft-NMS."""
        starts = self._window_starts(duration)
        nf = self.cfg.num_feats
        bs = self.batch_size

        all_scores, all_props = [], []
        for i in range(0, len(starts), bs):
            chunk = starts[i:i + bs]
            pad = bs - len(chunk)
            chunk_p = np.concatenate(
                [chunk, np.repeat(chunk[-1:], pad)]) if pad else chunk

            times_parts = []
            batch = {}
            if v_feats is not None:
                v, vt = self._assemble(v_feats, feat_times, chunk_p, "v")
                batch["v_feats"] = jnp.asarray(v)
                times_parts.append(vt)
            if a_feats is not None:
                a, at = self._assemble(a_feats, feat_times, chunk_p, "a")
                batch["a_feats"] = jnp.asarray(a)
                times_parts.append(at)
            batch["times"] = jnp.asarray(
                np.concatenate(times_parts, axis=1))
            batch["window_start"] = jnp.asarray(chunk_p, jnp.float32)
            batch["window_size"] = jnp.full(
                (len(chunk_p),), self.window_size, jnp.float32)

            out = self._infer(self.params, batch)
            take = len(chunk)
            key = "v_scores" if modality == "visual" else "a_scores"
            pkey = "v_proposals" if modality == "visual" else "a_proposals"
            all_scores.append(np.asarray(out[key][:take]))
            all_props.append(np.asarray(out[pkey][:take]))

        scores = np.concatenate(all_scores).reshape(-1,
                                                    all_scores[0].shape[-1])
        props = np.concatenate(all_props).reshape(-1, 2)
        vids = np.asarray(["__video__"] * len(props), object)
        cands = threshold_predictions(vids, props, scores, score_threshold)
        dets = nms_per_video(cands, iou_threshold=nms_iou, sigma=nms_sigma)
        if "__video__" not in dets:
            return {"segments": np.zeros((0, 2), np.float32),
                    "scores": np.zeros(0, np.float32),
                    "labels": np.zeros(0, np.int64)}
        d = dets["__video__"]
        return {"segments": d["segments"], "scores": d["scores"],
                "labels": d["labels"]}
