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
    nms_per_video, threshold_predictions, threshold_predictions_topk)
from tim_tpu.models import TimDetection
from tim_tpu.models.queries import generate_query_pyramid
from tim_tpu.train.detection import make_inference_step


class RecognitionServer:
    """Classify given [start, end] intervals of an untrimmed video with
    window-vote ensembling: each interval is answered from up to
    ``ensemble`` windows that contain it, logits are averaged and
    softmaxed (the reference's InferenceMeter mechanic as a serving call).
    """

    def __init__(
        self,
        cfg,
        params,
        *,
        feat_stride: int = 3,
        feat_gap: float = 0.2,
        window_stride: float = 1.0,
        ensemble: int = 5,
        batch_size: int = 64,
    ):
        from tim_tpu.models import TimRecognition

        self.cfg = cfg
        self.params = params
        self.feat_stride = feat_stride
        self.window_stride = window_stride
        self.window_size = cfg.num_feats * feat_gap * feat_stride
        self.ensemble = ensemble
        self.batch_size = batch_size
        self.model = TimRecognition(cfg)

        self._nv = 1 if "visual" in cfg.data_modality else 0
        self._na = 1 if "audio" in cfg.data_modality else 0

        def forward(params, v, a, times):
            logits, _ = self.model.apply(
                {"params": params}, v, a, times, self._nv, self._na,
                deterministic=True)
            return logits

        self._forward = jax.jit(forward)

    @classmethod
    def quantized(cls, cfg, params, calibration_batches,
                  **kwargs) -> "RecognitionServer":
        """Static-int8 recognition serving (the DetectionServer.quantized
        counterpart): int8 weights + calibrated activation scales baked
        as compile-time constants. ``calibration_batches``: iterable of
        (v, a, times) tuples shaped like the forward inputs, or None for
        a zero batch."""
        import dataclasses

        from tim_tpu.models import TimRecognition
        from tim_tpu.ops import quant

        qcfg = dataclasses.replace(cfg, quantized_inference=True)
        qmodel = TimRecognition(qcfg)
        qparams = quant.quantize_params(params)
        nv = 1 if "visual" in cfg.data_modality else 0
        na = 1 if "audio" in cfg.data_modality else 0

        def apply_fn(variables, batch, mutable):
            if batch is None:
                b = 1
                v = (jnp.zeros((b, cfg.num_feats, cfg.visual_input_dim))
                     if "visual" in cfg.input_modality else None)
                a = (jnp.zeros((b, cfg.num_feats, cfg.audio_input_dim))
                     if "audio" in cfg.input_modality else None)
                times = jnp.zeros((b, cfg.num_context + nv + na, 2))
            else:
                v, a, times = batch
            return qmodel.apply(variables, v, a, times, nv, na,
                                deterministic=True, mutable=mutable)

        calibrated = quant.calibrate_act_scales(
            apply_fn, {"params": qparams}, list(calibration_batches))
        scfg = dataclasses.replace(
            qcfg, quant_static_acts=True,
            quant_act_scales=quant.act_scales_tuple(calibrated))
        return cls(scfg, qparams, **kwargs)

    def _covering_windows(self, start: float, end: float) -> np.ndarray:
        """Up to ``ensemble`` window starts whose window contains (or best
        clips) the interval."""
        lo = max(0.0, end - self.window_size)
        lo = math.ceil(lo / self.window_stride) * self.window_stride
        hi = max(start, 0.0)
        starts = np.arange(lo, hi + 1e-6, self.window_stride)
        if len(starts) == 0:
            starts = np.asarray([max(0.0, start)])
        if len(starts) > self.ensemble:
            sel = np.linspace(0, len(starts) - 1, self.ensemble).astype(int)
            starts = starts[sel]
        return starts

    def classify_intervals(
        self,
        v_feats: Optional[np.ndarray],      # [T, Dv]
        a_feats: Optional[np.ndarray],      # [T, Da]
        feat_times: np.ndarray,             # [T, >=2]
        intervals: np.ndarray,              # [N, 2] video-time
    ) -> Dict[str, np.ndarray]:
        """Returns per-head softmax scores [N, C]."""
        nf = self.cfg.num_feats
        jobs = [(float(ws), qi)
                for qi, (s, e) in enumerate(intervals)
                for ws in self._covering_windows(float(s), float(e))]
        n = len(intervals)
        sums: Dict[str, np.ndarray] = {}
        counts = np.zeros(n)

        for i in range(0, len(jobs), self.batch_size):
            chunk = jobs[i:i + self.batch_size]
            pad = self.batch_size - len(chunk)
            chunk_p = chunk + [chunk[-1]] * pad

            feats_v, feats_a, batch_times = [], [], []
            for ws, qi in chunk_p:
                idx = window_feat_indices(
                    feat_times, ws,
                    min(ws + self.window_size, feat_times[-1, 1]),
                    self.feat_stride, nf)
                t_parts = []
                if v_feats is not None:
                    feats_v.append(v_feats[idx])
                    t_parts.append(feat_times[idx, :2])
                if a_feats is not None:
                    feats_a.append(a_feats[idx])
                    t_parts.append(feat_times[idx, :2])
                q = intervals[qi][None].astype(np.float32)
                t = np.concatenate(
                    t_parts + [q] * (self._nv + self._na), axis=0)
                batch_times.append(np.clip(
                    (t - ws) / self.window_size, 0.0, None))

            logits = self._forward(
                self.params,
                jnp.asarray(np.stack(feats_v), jnp.float32)
                if feats_v else None,
                jnp.asarray(np.stack(feats_a), jnp.float32)
                if feats_a else None,
                jnp.asarray(np.stack(batch_times), jnp.float32))

            for name, lg in zip(("verb", "noun", "action", "audio"),
                                logits):
                if lg is None:
                    continue
                lg = np.asarray(lg, np.float32)[:, 0]     # [B, C]
                if name not in sums:
                    sums[name] = np.zeros((n, lg.shape[-1]))
                for row, (ws, qi) in enumerate(chunk):
                    sums[name][qi] += lg[row]
            for ws, qi in chunk:
                counts[qi] += 1

        out = {}
        denom = np.maximum(counts, 1.0)[:, None]
        for name, s in sums.items():
            mean = s / denom
            e = np.exp(mean - mean.max(-1, keepdims=True))
            out[name] = e / e.sum(-1, keepdims=True)
        return out


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
        top_k: Optional[int] = None,
    ):
        self.cfg = cfg
        self.params = params
        self.feat_stride = feat_stride
        self.window_stride = window_stride
        self.window_size = cfg.num_feats * feat_gap * feat_stride
        self.batch_size = batch_size
        # top_k: ship only the k best classes per query from the device
        # (28x measured end-to-end for EPIC's 3806 classes; exact as long
        # as every above-threshold class fits in k)
        self.top_k = top_k
        self.model = TimDetection(cfg)
        self._infer = jax.jit(make_inference_step(self.model, cfg,
                                                  top_k=top_k))
        self.num_queries = generate_query_pyramid(
            cfg.inference_query_size).shape[0]

    @classmethod
    def quantized(cls, cfg: DetectionConfig, params, calibration_batches,
                  **kwargs) -> "DetectionServer":
        """Static-int8 serving mode: per-out-channel int8 weights
        (``ops.quant.quantize_params``) + calibrated per-layer activation
        scales baked as compile-time constants (measured 1.16x the bf16
        path on v5e; accuracy bound qualified on trained weights in
        ``tests/test_quant_accuracy.py``).

        ``calibration_batches``: iterable of inference batches (the dicts
        ``make_inference_step`` takes, or None for a zero batch) run once
        through the dynamic-quant path to observe activation maxima.
        """
        import dataclasses

        from tim_tpu.models.queries import generate_query_pyramid as gqp
        from tim_tpu.ops import quant

        qcfg = dataclasses.replace(cfg, quantized_inference=True)
        qmodel = TimDetection(qcfg)
        qparams = quant.quantize_params(params)
        nq = gqp(cfg.inference_query_size).shape[0]
        nv = nq if "visual" in cfg.data_modality else 0
        na = nq if "audio" in cfg.data_modality else 0

        def apply_fn(variables, batch, mutable):
            nf = cfg.num_context
            if batch is None:
                b = 1
                v = (jnp.zeros((b, cfg.num_feats, cfg.visual_input_dim))
                     if "visual" in cfg.input_modality else None)
                a = (jnp.zeros((b, cfg.num_feats, cfg.audio_input_dim))
                     if "audio" in cfg.input_modality else None)
                times = jnp.zeros((b, nf + nv + na, 2))
            else:
                v = batch.get("v_feats")
                a = batch.get("a_feats")
                b = (v if v is not None else a).shape[0]
                times = jnp.concatenate(
                    [batch["times"],
                     jnp.zeros((b, nv + na, 2), jnp.float32)], axis=1)
            return qmodel.apply(variables, v, a, times, nv, na,
                                deterministic=True, mutable=mutable)

        calibrated = quant.calibrate_act_scales(
            apply_fn, {"params": qparams}, list(calibration_batches))
        scfg = dataclasses.replace(
            qcfg, quant_static_acts=True,
            quant_act_scales=quant.act_scales_tuple(calibrated))
        return cls(scfg, qparams, **kwargs)

    # ------------------------------------------------------------------
    def _window_starts(self, duration: float) -> np.ndarray:
        dur = math.ceil(duration)
        n = max(math.ceil((dur - self.window_size)
                          / self.window_stride) + 1, 1)
        # float32 like the dataset path (float64 starts shift times by
        # 1 ulp and flip score-threshold boundaries)
        return (self.window_stride * np.arange(n)).astype(np.float32)

    def _assemble(self, feats, feat_times, starts, duration: float):
        """Exact dataset semantics (``build_detection_windows`` +
        ``DetectionDataset.__getitem__``): window stop clipped to
        ceil(duration), times rounded to 3 decimals before normalizing."""
        nf = self.cfg.num_feats
        dur = math.ceil(duration)
        idx = np.stack([
            window_feat_indices(feat_times, s,
                                min(dur, s + self.window_size),
                                self.feat_stride, nf)
            for s in starts])
        data = feats[idx]                                  # [B, F, D]
        times = feat_times[idx][:, :, :2]
        times = np.clip(
            np.round(times - starts[:, None, None], 3)
            / self.window_size, 0.0, None)
        return data.astype(np.float32), times.astype(np.float32)

    # ------------------------------------------------------------------
    def detect_video_media(
        self,
        video_clips: Optional[np.ndarray],   # [T, ...] raw clip per step
        audio_specs: Optional[np.ndarray],   # [T, ...] spectrogram per step
        feat_times: np.ndarray,              # [T, >=2]
        duration: float,
        *,
        visual_extractor=None,               # jitted [B, ...] -> [B, Dv]
        audio_extractor=None,                # jitted [B, ...] -> [B, Da]
        extract_batch: int = 8,
        **detect_kwargs,
    ) -> Dict[str, np.ndarray]:
        """Raw-media serving entry (BASELINE config 5 made a call): run
        the backbone extractors over every feature timestep on device,
        then window-slide the dense detection pyramid over the resulting
        banks — the reference's three offline programs
        (``omnivore/tools/extract_features.py:19-131``,
        ``VideoMAE/feature_extraction.py:149-253``,
        ``detection/scripts/extract_feats.py:68-139``) as one method.

        Extractors are jitted callables (e.g. a bound
        ``SwinTransformer3D``/``VideoMAEViT``/``AuditorySlowFast`` apply,
        or ``FusedDetectionPipeline.extract_visual``); each timestep's
        clip/spectrogram is assumed already preprocessed
        (``extract.pipeline.preprocess_video_clip`` / ``extract.audio``).
        """
        from tim_tpu.extract.pipeline import extract_features_for_video

        v_feats = a_feats = None
        if video_clips is not None:
            assert visual_extractor is not None, \
                "video clips given without a visual_extractor"
            v_feats = extract_features_for_video(
                lambda t, a: video_clips[t], len(video_clips), 1,
                visual_extractor, batch_size=extract_batch)[:, 0]
        if audio_specs is not None:
            assert audio_extractor is not None, \
                "audio spectrograms given without an audio_extractor"
            a_feats = extract_features_for_video(
                lambda t, a: audio_specs[t], len(audio_specs), 1,
                audio_extractor, batch_size=extract_batch)[:, 0]
        return self.detect_video(v_feats, a_feats, feat_times, duration,
                                 **detect_kwargs)

    # ------------------------------------------------------------------
    def detect_video_frames(
        self,
        frames: np.ndarray,                  # [Nf, H, W, 3] unique frames
        clip_frames: np.ndarray,             # [T, F] frame idx per timestep
        feat_times: np.ndarray,              # [T, >=2]
        duration: float,
        *,
        visual_model,                        # nn.Module or sequence
        visual_variables,                    # (sequence if model is one)
        audio_specs: Optional[np.ndarray] = None,
        audio_extractor=None,
        extract_batch: int = 8,
        mode: str = "auto",
        tubelet: int = 2,
        frame_transform=None,                # on-device, after gather
        **detect_kwargs,
    ) -> Dict[str, np.ndarray]:
        """Overlap-aware raw-media serving: ``detect_video_media`` minus
        its redundant uploads/embeds. The host ships each unique frame
        ONCE; clips are assembled on device by gather, and each unique
        frame pair is patch-embedded once (``extract/dense_media.py`` —
        exact, ~5x less host->device traffic at the reference's 0.2 s
        feature hop, ``make_framepickle.py:37-38``). ``clip_frames``
        holds 0-BASED row indices into ``frames``: rebase 1-based
        sampler output such as ``omnivore_frame_indices`` rows with
        ``table - 1`` (NOT per-table ``- table.min()`` — with multiple
        backbones sharing one bank, each table must rebase against the
        same origin or their "row 0" silently points at different
        frames). Out-of-range indices raise.

        ``mode="auto"`` uses ``stream`` — per-batch mini-banks whose
        host->device transfers overlap the previous batch's backbone
        compute — the measured-fastest serving path (2.30x real time vs
        1.65x for the up-front bank on the same uint8 run,
        ``scripts/bench_serve_frames.py``). ``gather``/``pair_embed``
        (up-front deduped bank, Swin's pair-embed dedup) remain for
        frames already resident on device or fast links
        (``scripts/bench_media_ingest.py``).

        Production EPIC visual features are a CONCAT of two backbones
        (Omnivore 1024 ‖ VideoMAE 1024, ``merge_features.py:80-83``):
        pass sequences for ``visual_model`` / ``visual_variables`` /
        ``clip_frames`` (one frame table per backbone — they sample
        different clip lengths from the same frame bank) and the
        per-backbone features concatenate along the feature axis in
        list order.

        Ship ``frames`` as uint8 with
        ``frame_transform=dense_media.uint8_normalizer()`` to halve the
        host->device bytes (the dense path is upload-bandwidth-bound);
        normalization runs on device after the bank gather."""
        from tim_tpu.extract.dense_media import (
            build_clip_plan, extract_dense_visual)
        from tim_tpu.extract.pipeline import extract_features_for_video

        models = (list(visual_model)
                  if isinstance(visual_model, (list, tuple))
                  else [visual_model])
        # keyed on the VARIABLES' own type: a plain dict is one set of
        # variables even when the model came as a one-element list
        variables = (list(visual_variables)
                     if isinstance(visual_variables, (list, tuple))
                     else [visual_variables])
        tables = (list(clip_frames)
                  if isinstance(clip_frames, (list, tuple))
                  else [clip_frames] * len(models))
        if not (len(models) == len(variables) == len(tables)):
            raise ValueError(
                f"visual_model/visual_variables/clip_frames lengths "
                f"differ: {len(models)}/{len(variables)}/{len(tables)}")

        parts = []
        for m, var, table in zip(models, variables, tables):
            bmode = "stream" if mode == "auto" else mode
            table = np.asarray(table)
            if table.min() < 0 or table.max() >= len(frames):
                raise ValueError(
                    f"clip_frames must be 0-based indices into frames "
                    f"[0, {len(frames)}); got range "
                    f"[{table.min()}, {table.max()}] — rebase 1-based "
                    f"sampler rows with `table - 1` (one shared origin "
                    f"for all backbones)")
            plan = build_clip_plan(table, tubelet=tubelet)
            rows = plan.unique_frames
            # skip the fancy-index host copy (hundreds of MB on the
            # latency path) when the table already touches every frame
            bank = (frames if len(rows) == len(frames)
                    and np.array_equal(rows, np.arange(len(frames)))
                    else frames[rows])
            parts.append(extract_dense_visual(
                m, var, bank, plan,
                batch_size=extract_batch, mode=bmode,
                frame_transform=frame_transform))
        if len({len(p) for p in parts}) > 1:
            raise ValueError(
                f"backbone frame tables produced different timestep "
                f"counts: {[len(p) for p in parts]}")
        v_feats = (parts[0] if len(parts) == 1
                   else np.concatenate(parts, axis=-1))
        a_feats = None
        if audio_specs is not None:
            assert audio_extractor is not None, \
                "audio spectrograms given without an audio_extractor"
            a_feats = extract_features_for_video(
                lambda t, a: audio_specs[t], len(audio_specs), 1,
                audio_extractor, batch_size=extract_batch)[:, 0]
        return self.detect_video(v_feats, a_feats, feat_times, duration,
                                 **detect_kwargs)

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
                v, vt = self._assemble(v_feats, feat_times, chunk_p,
                                       duration)
                batch["v_feats"] = jnp.asarray(v)
                times_parts.append(vt)
            if a_feats is not None:
                a, at = self._assemble(a_feats, feat_times, chunk_p,
                                       duration)
                batch["a_feats"] = jnp.asarray(a)
                times_parts.append(at)
            batch["times"] = jnp.asarray(
                np.concatenate(times_parts, axis=1))
            batch["window_start"] = jnp.asarray(chunk_p, jnp.float32)
            batch["window_size"] = jnp.full(
                (len(chunk_p),), self.window_size, jnp.float32)

            out = self._infer(self.params, batch)
            take = len(chunk)
            base = "v" if modality == "visual" else "a"
            pkey = f"{base}_proposals"
            if self.top_k is None:
                all_scores.append(np.asarray(out[f"{base}_scores"][:take]))
            else:
                all_scores.append(
                    (np.asarray(out[f"{base}_topk_values"][:take]),
                     np.asarray(out[f"{base}_topk_classes"][:take])))
            all_props.append(np.asarray(out[pkey][:take]))

        props = np.concatenate(all_props).reshape(-1, 2)
        vids = np.asarray(["__video__"] * len(props), object)
        if self.top_k is None:
            scores = np.concatenate(all_scores).reshape(
                -1, all_scores[0].shape[-1])
            cands = threshold_predictions(vids, props, scores,
                                          score_threshold)
        else:
            vals = np.concatenate([v for v, _ in all_scores]).reshape(
                -1, all_scores[0][0].shape[-1])
            classes = np.concatenate([c for _, c in all_scores]).reshape(
                -1, all_scores[0][1].shape[-1])
            cands = threshold_predictions_topk(
                vids, props, vals, classes,
                score_threshold=score_threshold)
        dets = nms_per_video(cands, iou_threshold=nms_iou, sigma=nms_sigma)
        if "__video__" not in dets:
            return {"segments": np.zeros((0, 2), np.float32),
                    "scores": np.zeros(0, np.float32),
                    "labels": np.zeros(0, np.int64)}
        d = dets["__video__"]
        return {"segments": d["segments"], "scores": d["scores"],
                "labels": d["labels"]}
