"""Fused end-to-end pipeline: raw clips -> backbone features -> TIM.

BASELINE.json config 5: "Omnivore/VideoMAE + Auditory SlowFast feature
extraction fused upstream of TIM". The reference runs feature extraction
as separate offline programs writing .npy files; here the whole path —
video clips through the visual backbones, audio spectrograms through the
audio backbone, features through the TIM encoder — is one jit-compiled
graph, enabling online inference without a feature cache and end-to-end
finetuning of the backbones through TIM's losses.

Shapes: every window carries ``num_feats`` feature timestamps; each
timestamp has one video clip and one audio spectrogram. Backbones run on
the flattened [B * F] clip batch (optionally rematerialized), then TIM
consumes the reassembled [B, F, D] feature tokens.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from tim_tpu.config import DetectionConfig, ModelConfig
from tim_tpu.models.backbones.slowfast import AuditorySlowFast, pack_pathways
from tim_tpu.models.backbones.swin3d import SwinTransformer3D
from tim_tpu.models.backbones.vit import VideoMAEViT
from tim_tpu.models.tim import TimDetection, TimRecognition


class FusedRecognitionPipeline(nn.Module):
    """Raw media -> TIM logits in one graph.

    visual backbone(s): 'omnivore', 'videomae', or 'both' (features
    concatenated, the merge_features layout). ``tim_cfg.visual_input_dim``
    must match the produced feature width.
    """

    tim_cfg: ModelConfig
    visual_backbone: str = "both"
    swin: Optional[SwinTransformer3D] = None
    vit: Optional[VideoMAEViT] = None
    audio_alpha: int = 4
    use_flash: bool = False   # Pallas TPU flash attention (ViT + Swin)

    def setup(self):
        cfg = self.tim_cfg
        if "visual" in cfg.input_modality:
            if self.visual_backbone in ("omnivore", "both"):
                self.swin_model = self.swin or SwinTransformer3D(
                    dtype=jnp.dtype(cfg.compute_dtype),
                    use_flash=self.use_flash)
            if self.visual_backbone in ("videomae", "both"):
                self.vit_model = self.vit or VideoMAEViT(
                    dtype=jnp.dtype(cfg.compute_dtype),
                    use_flash=self.use_flash)
        if "audio" in cfg.input_modality:
            self.audio_model = AuditorySlowFast(alpha=self.audio_alpha)
        self.tim = TimRecognition(cfg)

    def extract_visual(self, clips):
        """[B, F, T, H, W, 3] -> [B, F, Dv]."""
        b, f = clips.shape[:2]
        flat = clips.reshape((b * f,) + clips.shape[2:])
        feats = []
        if self.visual_backbone in ("omnivore", "both"):
            feats.append(self.swin_model(flat))
        if self.visual_backbone in ("videomae", "both"):
            feats.append(self.vit_model(flat))
        out = jnp.concatenate(feats, axis=-1)
        return out.reshape(b, f, out.shape[-1])

    def extract_audio(self, spectrograms):
        """[B, F, T_spec, n_mels] -> [B, F, 2304]."""
        b, f = spectrograms.shape[:2]
        flat = spectrograms.reshape((b * f,) + spectrograms.shape[2:])
        slow, fast = pack_pathways(flat[..., None], alpha=self.audio_alpha)
        _, feats = self.audio_model(slow, fast, train=False)
        return feats.reshape(b, f, feats.shape[-1])

    def __call__(self, video_clips, audio_specs, times,
                 num_v_queries: int, num_a_queries: int,
                 *, deterministic: bool = True):
        v_feats = a_feats = None
        if "visual" in self.tim_cfg.input_modality:
            v_feats = self.extract_visual(video_clips)
        if "audio" in self.tim_cfg.input_modality:
            a_feats = self.extract_audio(audio_specs)
        return self.tim(v_feats, a_feats, times,
                        num_v_queries, num_a_queries,
                        deterministic=deterministic)


class FusedDetectionPipeline(nn.Module):
    """Raw media -> dense detection proposals in one graph (BASELINE
    config 5, detection side): clips/spectrograms through the backbones,
    features through the detection TIM with its query pyramid.

    ``times`` must carry the feature timestamps followed by the query
    intervals (visual then audio), exactly as ``TimDetection.__call__``
    expects; the runners/server build that layout.
    """

    tim_cfg: DetectionConfig
    visual_backbone: str = "both"
    swin: Optional[SwinTransformer3D] = None
    vit: Optional[VideoMAEViT] = None
    audio_alpha: int = 4
    use_flash: bool = False   # Pallas TPU flash attention (ViT + Swin)

    def setup(self):
        cfg = self.tim_cfg
        if "visual" in cfg.input_modality:
            if self.visual_backbone in ("omnivore", "both"):
                self.swin_model = self.swin or SwinTransformer3D(
                    dtype=jnp.dtype(cfg.compute_dtype),
                    use_flash=self.use_flash)
            if self.visual_backbone in ("videomae", "both"):
                self.vit_model = self.vit or VideoMAEViT(
                    dtype=jnp.dtype(cfg.compute_dtype),
                    use_flash=self.use_flash)
        if "audio" in cfg.input_modality:
            self.audio_model = AuditorySlowFast(alpha=self.audio_alpha)
        self.tim = TimDetection(cfg)

    extract_visual = FusedRecognitionPipeline.extract_visual
    extract_audio = FusedRecognitionPipeline.extract_audio

    def __call__(self, video_clips, audio_specs, times,
                 num_v_queries: int, num_a_queries: int,
                 *, deterministic: bool = True,
                 shared_queries: bool = False):
        cfg = self.tim_cfg
        v_feats = a_feats = None
        if "visual" in cfg.input_modality:
            v_feats = self.extract_visual(video_clips)
        if "audio" in cfg.input_modality:
            a_feats = self.extract_audio(audio_specs)
        te = self.tim.encode_times(times)
        return self.tim.encoder_forward(
            v_feats, a_feats, te, num_v_queries, num_a_queries,
            deterministic=deterministic, shared_queries=shared_queries)
