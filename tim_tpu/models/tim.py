"""TIM — Time Interval Machine, TPU-native.

One trained transformer answers "what happens in this time interval?" over a
window of pre-extracted audio/visual feature tokens plus learnable interval
query tokens. Recognition classifies GT-aligned queries
(``recognition/.../models/tim.py:17-192``); detection densely classifies and
regresses a multi-scale query pyramid (``detection/.../models/tim.py``).

Differences from the reference by design:
- batch-first [B, S, C] everywhere; no [S, B, C] shuttling;
- the encoder runs the exact structured attention kernel instead of a dense
  [B*H, S, S] boolean mask (see ``tim_tpu/ops/attention.py``);
- the forward is split into pure methods (``encode_times`` / ``encoder`` /
  ``drloc``) composed by jit train steps, instead of string-multiplexed
  ``forward(inputs, forward_type)``;
- query pyramid sampling/labeling are pure functions
  (``tim_tpu/models/queries.py``) threaded with explicit PRNG keys.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from tim_tpu.config import DetectionConfig, ModelConfig
from tim_tpu.models.common import MLP
from tim_tpu.models.encodings import FeatureEncoding
from tim_tpu.models.heads import (
    DetectionClsHead, DetectionRegHead, RecognitionClsHead)
from tim_tpu.models.pool import AVGA
from tim_tpu.models.transformer import Encoder
from tim_tpu.ops.quant import filter_scales


def _dtype_of(cfg: ModelConfig):
    return jnp.dtype(cfg.compute_dtype)


class _TimBase(nn.Module):
    """Shared trunk: time MLP, feature encoding, encoder, drloc MLP."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = _dtype_of(cfg)
        d = cfg.d_model

        # Linear(2->d) -> ReLU x3 -> LayerNorm (``tim.py:66-74``).
        self.time_mlp_core = MLP((d, d, d), dtype=dtype,
                                 final_activation="relu", name="time_mlp")
        self.time_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                      name="time_norm")

        self.feature_encoding = FeatureEncoding(
            d_model=d,
            input_modality=cfg.input_modality,
            data_modality=cfg.data_modality,
            feat_dropout=cfg.feat_dropout,
            seq_dropout=cfg.seq_dropout,
            num_feats=cfg.num_feats,
            use_verb_noun_cls=self._use_verb_noun_cls(),
            dtype=dtype,
            name="feature_encoding",
        )

        self.encoder = Encoder(
            d_model=cfg.encoder_width,
            nhead=cfg.nhead,
            dim_feedforward=cfg.d_model * cfg.feedforward_scale,
            num_layers=cfg.num_layers,
            dropout=cfg.enc_dropout,
            dtype=dtype,
            remat=cfg.remat,
            quantized=cfg.quantized_inference,
            quant_static_acts=cfg.quant_static_acts,
            act_scales=filter_scales(cfg.quant_act_scales, "encoder"),
            fused_ffn=cfg.use_fused_ffn,
            fast_scores=cfg.fast_scores,
            sequence_parallel=cfg.sequence_parallel,
            dropout_bits=cfg.dropout_bits,
            name="encoder",
        )

        # Linear(4d->d) -> ReLU -> Linear(d->d) -> ReLU -> Linear(d->1).
        self.drloc_head = MLP((d, d, 1), dtype=dtype, name="drloc_mlp")

        if cfg.apply_feature_pooling:
            self.pool = AVGA(hidden_size=cfg.visual_input_dim, dtype=dtype,
                             name="pool")

    def _use_verb_noun_cls(self) -> bool:
        return self.cfg.include_verb_noun

    def encode_times(self, times):
        """[..., 2] interval (start, end) -> [..., d_model] encoding."""
        x = self.time_mlp_core(times.astype(_dtype_of(self.cfg)))
        return self.time_norm(x).astype(_dtype_of(self.cfg))

    def drloc(self, x):
        """Concatenated token pairs [..., 4*d_model] -> scalar |dt| preds."""
        return self.drloc_head(x)[..., 0]

    def _encode_sequence(self, v_feats, a_feats, time_encodings,
                         num_v_queries, num_a_queries, deterministic,
                         shared_queries=False):
        cfg = self.cfg
        if self.is_initializing():
            # materialize the drloc head params (only reached from the train
            # step, which flax's lazy init would otherwise never see)
            self.drloc(jnp.zeros((1, 1, 2 * cfg.encoder_width)))
        if cfg.apply_feature_pooling:
            if v_feats.ndim == 3:
                # reference AVE npy layout stores the 7x7 map flattened
                # into the channel dim ([T, A, P*Dv]); the model reshapes
                # before pooling (``recognition tim.py:155-156`` +
                # ``pool.py:30`` view semantics)
                b, t = v_feats.shape[:2]
                v_feats = v_feats.reshape(b, t, -1, cfg.visual_input_dim)
            v_feats = self.pool(a_feats, v_feats)
        x = self.feature_encoding(
            v_feats, a_feats, time_encodings,
            num_v_queries, num_a_queries, deterministic=deterministic)
        x = self.encoder(x, cfg.num_context, deterministic=deterministic,
                         shared_queries=shared_queries)
        return x


class TimRecognition(_TimBase):
    """Recognition variant: per-task CLS query tokens + linear heads."""

    cfg: ModelConfig

    def setup(self):
        super().setup()
        cfg = self.cfg
        vis = cfg.visual_classes if "visual" in cfg.data_modality else None
        aud = cfg.audio_classes if "audio" in cfg.data_modality else None
        self.cls_head = RecognitionClsHead(
            visual_classes=vis, audio_classes=aud, dtype=_dtype_of(cfg),
            quantized=cfg.quantized_inference,
            quant_static_acts=cfg.quant_static_acts,
            act_scales=filter_scales(cfg.quant_act_scales, "cls_head"),
            name="cls_head")

    def encoder_forward(
        self, v_feats, a_feats, time_encodings,
        num_v_queries: int, num_a_queries: int,
        *, deterministic: bool = True,
    ):
        """Returns ((verb, noun, action, audio) logits each [B, Nq, C] or
        None, context tokens [B, num_context, 2d])."""
        x = self._encode_sequence(
            v_feats, a_feats, time_encodings,
            num_v_queries, num_a_queries, deterministic)
        logits = self.cls_head(x, num_v_queries, num_a_queries)
        return logits, x[:, :self.cfg.num_context]

    def __call__(self, v_feats, a_feats, times,
                 num_v_queries: int, num_a_queries: int,
                 *, deterministic: bool = True):
        """Convenience full forward: times [B, T, 2] covers feature times
        then query intervals (visual, audio)."""
        te = self.encode_times(times)
        return self.encoder_forward(
            v_feats, a_feats, te, num_v_queries, num_a_queries,
            deterministic=deterministic)


class TimDetection(_TimBase):
    """Detection variant: shared query tokens, cls + interval-reg heads.

    Query pyramid generation and IoU labeling are pure functions in
    ``tim_tpu/models/queries.py``; the train/eval steps feed the sampled
    query intervals in via ``times``.
    """

    cfg: DetectionConfig

    def setup(self):
        super().setup()
        cfg = self.cfg
        vis = cfg.visual_classes if "visual" in cfg.data_modality else None
        aud = cfg.audio_classes if "audio" in cfg.data_modality else None
        dtype = _dtype_of(cfg)
        self.cls_head = DetectionClsHead(
            visual_classes=vis, audio_classes=aud, dtype=dtype,
            quantized=cfg.quantized_inference,
            quant_static_acts=cfg.quant_static_acts,
            act_scales=filter_scales(cfg.quant_act_scales, "cls_head"),
            pallas_fused=cfg.quant_pallas_heads,
            name="cls_head")
        self.reg_head = DetectionRegHead(
            has_visual=vis is not None, has_audio=aud is not None,
            d_model=cfg.encoder_width, dtype=dtype, name="reg_head")

    def _use_verb_noun_cls(self) -> bool:
        # Detection shares one query token set across verb/noun/action heads.
        return False

    def encoder_forward(
        self, v_feats, a_feats, time_encodings,
        num_v_queries: int, num_a_queries: int,
        *, deterministic: bool = True, shared_queries: bool = False,
    ):
        """Returns (cls_logits 4-tuple, (v_reg, a_reg) each [B, Nq, 2],
        context tokens). ``shared_queries``: set only when the query tokens
        (intervals AND their time encodings) are identical across the batch
        (dense inference grids)."""
        x = self._encode_sequence(
            v_feats, a_feats, time_encodings,
            num_v_queries, num_a_queries, deterministic, shared_queries)
        cls_scores = self.cls_head(x, num_v_queries, num_a_queries)
        reg_scores = self.reg_head(x, num_v_queries, num_a_queries)
        return cls_scores, reg_scores, x[:, :self.cfg.num_context]

    def __call__(self, v_feats, a_feats, times,
                 num_v_queries: int, num_a_queries: int,
                 *, deterministic: bool = True):
        te = self.encode_times(times)
        return self.encoder_forward(
            v_feats, a_feats, te, num_v_queries, num_a_queries,
            deterministic=deterministic)
