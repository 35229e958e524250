"""Unified configuration for TIM-TPU.

The reference spreads configuration over ~50 argparse flags per variant
(``recognition/time_interval_machine/utils/parser.py:7-205`` and
``detection/time_interval_machine/utils/parser.py:8-219``) plus yacs configs
for the backbones. Here everything is a frozen dataclass so configs are
hashable (usable as jit static arguments) and presets are plain functions.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ModelConfig:
    """Architecture of the TIM transformer.

    Defaults mirror the reference recognition variant
    (``recognition/.../utils/parser.py:53-62``): d_model 512, 8 heads,
    4 layers, feed-forward 4*d_model applied to the 2*d_model-wide encoder.
    """

    # Class counts. ``visual_classes`` is either a single int (action only) or
    # a triple (verb, noun, action). ``audio_classes`` is a single int.
    visual_classes: Tuple[int, ...] = (97, 300, 3806)
    audio_classes: int = 44

    visual_input_dim: int = 1024
    audio_input_dim: int = 2304
    d_model: int = 512
    feedforward_scale: int = 4
    nhead: int = 8
    num_layers: int = 4
    enc_dropout: float = 0.1
    feat_dropout: float = 0.5
    seq_dropout: float = 0.5

    # Modality of input *features* ("visual" | "audio" | "audio_visual").
    input_modality: str = "audio_visual"
    # Modality of *queries/labels* the model answers.
    data_modality: str = "audio_visual"

    # Number of context feature tokens per modality in a window.
    num_feats: int = 50
    include_verb_noun: bool = True
    # AVGA audio-guided spatial pooling over 7x7 visual maps (AVE only).
    apply_feature_pooling: bool = False

    # Numerics: matmuls/activations run in this dtype; params stay fp32.
    compute_dtype: str = "bfloat16"
    # Rematerialize encoder layers in backward (memory <-> FLOPs trade).
    remat: bool = False
    # Fused Pallas post-attention block (residual+LN1+FFN+residual+LN2 in
    # VMEM, ``ops/pallas_fused.py``) on deterministic steps; training
    # keeps the unfused stack (the kernel defines no backward).
    use_fused_ffn: bool = False
    # Int8 serving: encoder + class-head matmuls run int8 (weights from
    # ``ops.quant.quantize_params``); inference only.
    quantized_inference: bool = False
    # Use calibrated static per-layer activation scales (see
    # ``ops.quant.calibrate_act_scales``) instead of dynamic per-row
    # abs-max; +16%% measured on v5e but requires calibration first.
    quant_static_acts: bool = False
    # Calibrated (param_path, scale) pairs baked as compile-time constants
    # (``ops.quant.act_scales_tuple``); empty -> act_scale params are used.
    quant_act_scales: Tuple[Tuple[str, float], ...] = ()
    # Mosaic fused int8 kernel on the classifier heads (the one shape
    # where it measured faster than XLA; needs quant_static_acts with
    # calibrated scales). ops/pallas_int8.py; opt-in.
    quant_pallas_heads: bool = False
    # serving knob: bf16 attention scores/softmax (outputs still
    # accumulate fp32) — measured +5% dense inference; accuracy bound in
    # tests/test_quant_accuracy.py
    fast_scores: bool = False
    # training knob: dropout mask bit width. 32 = flax nn.Dropout
    # bernoulli semantics; 8 = uint8 masks with a 1/256-quantized keep
    # prob (``ops/dropout.py``) — 4x fewer generated random bits,
    # statistically equivalent, not bit-exact. Recognition default 32
    # (measured flat); detection default 8 (246->291 win/s measured,
    # see DetectionConfig).
    dropout_bits: int = 32
    # Sequence parallelism: shard the token axis over the 'model' mesh
    # axis in the encoder's post-LN regions (Megatron-SP layout; XLA
    # GSPMD inserts the gather/scatter collectives). Requires an active
    # mesh (the runners call jax.set_mesh when this is on).
    sequence_parallel: bool = False

    @property
    def encoder_width(self) -> int:
        return 2 * self.d_model

    @property
    def num_context(self) -> int:
        """Total context tokens seen by the encoder (reference doubles
        ``num_feats`` for audio_visual input, ``recognition tim.py:87``)."""
        if self.input_modality == "audio_visual":
            return 2 * self.num_feats
        return self.num_feats

    @property
    def vis_mul(self) -> int:
        """Visual CLS token sets per query (verb+noun+action or action only)."""
        return 3 if self.include_verb_noun else 1

    def seq_len(self, num_v_queries: int, num_a_queries: int) -> int:
        n = self.num_context
        if "visual" in self.data_modality:
            n += self.vis_mul * num_v_queries
        if "audio" in self.data_modality:
            n += num_a_queries
        return n


@dataclass(frozen=True)
class DetectionConfig(ModelConfig):
    """Detection variant deltas (``detection/.../utils/parser.py:43-122``)."""

    num_layers: int = 6
    visual_input_dim: int = 2048
    include_verb_noun: bool = False
    # Detection trains with uint8-mask dropout by default: 246 -> 291
    # win/s measured on v5e (dropout RNG was ~1/3 of the step; see
    # docs/PERFORMANCE.md). 32 restores flax nn.Dropout draws.
    dropout_bits: int = 8

    iou_threshold: float = 0.6
    label_smoothing: float = 0.9     # positive-label one-hot scale
    # Query pyramid: smallest interval (fraction of window) for train pool
    # and for the fixed inference grid (``detection tim.py:140-141``).
    train_query_size: float = 0.005
    inference_query_size: float = 0.01

    @property
    def vis_mul(self) -> int:
        # Detection never instantiates verb/noun CLS tokens; verb/noun logits
        # come from separate heads over the shared action query tokens
        # (``detection/.../helpers/encodings.py``, ``head.py:27-46``).
        return 1


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TrainConfig:
    """Optimization schedule (reference recipe, ``parser.py:75-132``)."""

    batch_size: int = 64
    epochs: int = 100
    warmup_epochs: int = 2
    lr: float = 1e-4
    min_lr: float = 1e-6
    weight_decay: float = 1e-4
    clip_norm: float = 1.0

    label_smoothing: float = 0.2     # recognition CE smoothing
    mixup_alpha: float = 0.2
    lambda_audio: float = 1.0
    lambda_drloc: float = 0.3
    m_drloc: int = 32

    # Detection-only knobs (``detection/.../parser.py``).
    lambda_reg: float = 0.5
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    normaliser_init: float = 250.0
    normaliser_momentum: float = 0.9

    seed: int = 0
    early_stop_period: int = -1

    # XLA's experimental fusion cost model, passed as compiler_options
    # on the recognition train-step jit: measured +10-12% train
    # throughput on v5e (2170-2207 vs 1971-1985 win/s b64, repeated;
    # scripts/bench_xla_options.py). NOT applied to detection (the flag
    # crashes this relay's compiler on that graph) or to inference
    # (slight loss, 1157 vs 1165). TPU-only; ignored on CPU.
    xla_fusion_cost_model: bool = True

    # PRNG implementation for the training rng key (dropout masks, mixup,
    # drloc sampling). "rbg" feeds dropout from XLA's RngBitGenerator —
    # the TPU hardware RNG — instead of threefry2x32 on the VPU: measured
    # 208 -> 245 win/s detection train b64 (threefry mask bits were ~1/3
    # of the step; scripts/bench_bwd_micro.py, docs/PERFORMANCE.md).
    # Statistically equivalent dropout; set "threefry2x32" for bit-exact
    # reproduction of historical runs. Deterministic (eval/serving) paths
    # draw no random bits and are unaffected.
    rng_impl: str = "rbg"


# ---------------------------------------------------------------------------
# Data
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DataConfig:
    """Sliding-window dataset parameters (``sliding_window.py:35-74``)."""

    visual_data_path: str = ""
    audio_data_path: str = ""
    video_info_pickle: str = ""
    visual_action_pickles: Tuple[str, str] = ("", "")   # (train, val)
    audio_action_pickles: Tuple[str, str] = ("", "")
    visual_context_pickles: Tuple[str, str] = ("", "")  # feature-time tables
    audio_context_pickles: Tuple[str, str] = ("", "")

    dataset_name: str = "epic"       # epic | perception | ave
    num_feats: int = 50
    feat_stride: int = 3
    feat_gap: float = 0.2
    window_stride: float = 1.0
    min_query_size: float = 0.2
    num_workers: int = 8

    @property
    def window_size(self) -> float:
        return self.num_feats * self.feat_gap * self.feat_stride


# ---------------------------------------------------------------------------
# Parallelism
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. ``data`` shards the batch (replaces DDP,
    ``recognition/.../models/build.py:51-63``); ``model`` optionally shards
    the feed-forward hidden dim and the wide classifier heads (tensor
    parallelism the reference does not have)."""

    data: int = -1   # -1: use all remaining devices
    model: int = 1


# ---------------------------------------------------------------------------
# Presets — dataset-specific class counts (``parser.py:196-204``)
# ---------------------------------------------------------------------------

def epic_recognition(**overrides) -> ModelConfig:
    return dataclasses.replace(ModelConfig(), **overrides)


def epic_visual_only(**overrides) -> ModelConfig:
    cfg = ModelConfig(input_modality="visual", data_modality="visual")
    return dataclasses.replace(cfg, **overrides)


def perception_recognition(**overrides) -> ModelConfig:
    cfg = ModelConfig(visual_classes=(63,), audio_classes=17,
                      include_verb_noun=False)
    return dataclasses.replace(cfg, **overrides)


def ave_recognition(**overrides) -> ModelConfig:
    # AVEL-standard feature dims: VGG 7x7x512 spatial maps (stored flat as
    # [T, A, 49*512]) + 128-d audio (``pool.py:10`` a_dim/v_dim defaults).
    cfg = ModelConfig(visual_classes=(29,), audio_classes=29,
                      include_verb_noun=False, apply_feature_pooling=True,
                      visual_input_dim=512, audio_input_dim=128)
    return dataclasses.replace(cfg, **overrides)


def epic_detection(**overrides) -> DetectionConfig:
    # EPIC-100 detection trains action-only heads by default
    # (``detection/.../parser.py`` include_verb_noun=False).
    cfg = DetectionConfig(visual_classes=(3806,), audio_classes=44)
    return dataclasses.replace(cfg, **overrides)


def perception_detection(**overrides) -> DetectionConfig:
    cfg = DetectionConfig(visual_classes=(63,), audio_classes=17)
    return dataclasses.replace(cfg, **overrides)
