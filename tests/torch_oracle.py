"""Torch oracle for parity tests — FAST PROXY ONLY.

The authoritative parity oracle is the *actual reference code* executed
in-process: see ``tests/test_reference_model_golden.py``, which imports
``recognition/.../models/tim.py`` and ``detection/.../models/tim.py``
directly and checks forward logits, query labeling, and gradients through
the converter. This module remains as a cheap state-dict-key-equivalent
transcription used by quick unit tests (attention/quant/serve) that don't
want the sys.modules sandbox. Dropout modules are omitted (eval-mode
no-ops, no params).
"""

import math

import torch
import torch.nn.functional as F
from torch import nn


def _time_mlp(d):
    return nn.Sequential(
        nn.Linear(2, d), nn.ReLU(), nn.Linear(d, d), nn.ReLU(),
        nn.Linear(d, d), nn.ReLU(), nn.LayerNorm(d))


def _embedder(d_in, d):
    # index 1/3 match the reference Sequential (Dropout at 0, GELU at 2).
    return nn.Sequential(nn.Identity(), nn.Linear(d_in, d), nn.GELU(),
                         nn.LayerNorm(d))


class _PostNormLayer(nn.Module):
    def __init__(self, width, nhead, ff):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(width, nhead, dropout=0.0)
        self.norm1 = nn.LayerNorm(width)
        self.linear1 = nn.Linear(width, ff)
        self.linear2 = nn.Linear(ff, width)
        self.norm2 = nn.LayerNorm(width)

    def forward(self, x, mask):
        a, _ = self.self_attn(x, x, x, attn_mask=mask)
        x = self.norm1(x + a)
        f = self.linear2(F.gelu(self.linear1(x)))
        return self.norm2(x + f)


class _Stack(nn.Module):
    def __init__(self, width, nhead, ff, n):
        super().__init__()
        self.layers = nn.ModuleList(
            [_PostNormLayer(width, nhead, ff) for _ in range(n)])

    def forward(self, x, mask):
        for l in self.layers:
            x = l(x, mask)
        return x


def _tim_mask(s, num_ctx, nhead, batch):
    m = torch.ones(s, s)
    m[:, :num_ctx] = 0.0
    m.fill_diagonal_(0.0)
    return m.unsqueeze(0).repeat_interleave(nhead * batch, dim=0).bool()


class OracleRecognitionAV(nn.Module):
    """Audio-visual recognition TIM with verb/noun heads."""

    def __init__(self, dv, da, d, nhead, layers, classes):
        super().__init__()
        wide = 2 * d
        self.d, self.nhead = d, nhead
        self.time_mlp = _time_mlp(d)

        fe = nn.Module()
        fe.visual_embedder = _embedder(dv, d)
        fe.audio_embedder = _embedder(da, d)
        fe.visual_modality_encoding = nn.Parameter(
            torch.randn(1, 1, wide) * 0.01)
        fe.audio_modality_encoding = nn.Parameter(
            torch.randn(1, 1, wide) * 0.01)
        fe.visual_verb_cls = nn.Parameter(torch.randn(1, 1, d) * 0.01)
        fe.visual_noun_cls = nn.Parameter(torch.randn(1, 1, d) * 0.01)
        fe.visual_action_cls = nn.Parameter(torch.randn(1, 1, d) * 0.01)
        fe.audio_action_cls = nn.Parameter(torch.randn(1, 1, d) * 0.01)
        self.feature_encoding = fe

        self.transformer_encoder = _Stack(wide, nhead, 4 * d, layers)

        ch = nn.Module()
        (verb_c, noun_c, act_c), aud_c = classes
        ch.fc_visual_verb = nn.Linear(wide, verb_c)
        ch.fc_visual_noun = nn.Linear(wide, noun_c)
        ch.fc_visual_action = nn.Linear(wide, act_c)
        ch.fc_audio_action = nn.Linear(wide, aud_c)
        self.cls_head = ch

        self.drloc_mlp = nn.Sequential(
            nn.Linear(2 * wide, d), nn.ReLU(), nn.Linear(d, d), nn.ReLU(),
            nn.Linear(d, 1))

    def forward(self, v, a, times, nv, na):
        b, f = v.shape[0], v.shape[1]
        fe = self.feature_encoding
        te = self.time_mlp(times)
        vis = torch.cat([fe.visual_embedder(v), te[:, :f]], -1) \
            + fe.visual_modality_encoding
        aud = torch.cat([fe.audio_embedder(a), te[:, f:2 * f]], -1) \
            + fe.audio_modality_encoding
        qte = te[:, 2 * f:]
        parts = [vis, aud]
        for tok in (fe.visual_verb_cls, fe.visual_noun_cls,
                    fe.visual_action_cls):
            parts.append(torch.cat(
                [tok.expand(b, nv, -1), qte[:, :nv]], -1)
                + fe.visual_modality_encoding)
        parts.append(torch.cat(
            [fe.audio_action_cls.expand(b, na, -1), qte[:, -na:]], -1)
            + fe.audio_modality_encoding)
        x = torch.cat(parts, 1).transpose(0, 1)

        mask = _tim_mask(x.shape[0], 2 * f, self.nhead, b)
        x = self.transformer_encoder(x, mask).transpose(0, 1)

        aud_start = x.shape[1] - na
        act_start = aud_start - nv
        noun_start = act_start - nv
        verb_start = noun_start - nv
        ch = self.cls_head
        return (
            ch.fc_visual_verb(x[:, verb_start:noun_start]),
            ch.fc_visual_noun(x[:, noun_start:act_start]),
            ch.fc_visual_action(x[:, act_start:aud_start]),
            ch.fc_audio_action(x[:, aud_start:]),
            x[:, :2 * f],
        )


class OracleDetectionAV(nn.Module):
    """Audio-visual detection TIM: shared query tokens, cls + reg heads."""

    def __init__(self, dv, da, d, nhead, layers, classes):
        super().__init__()
        wide = 2 * d
        self.d, self.nhead = d, nhead
        self.time_mlp = _time_mlp(d)

        fe = nn.Module()
        fe.visual_embedder = _embedder(dv, d)
        fe.audio_embedder = _embedder(da, d)
        fe.visual_modality_encoding = nn.Parameter(
            torch.randn(1, 1, wide) * 0.01)
        fe.audio_modality_encoding = nn.Parameter(
            torch.randn(1, 1, wide) * 0.01)
        fe.visual_action_cls = nn.Parameter(torch.randn(1, 1, d) * 0.01)
        fe.audio_action_cls = nn.Parameter(torch.randn(1, 1, d) * 0.01)
        self.feature_encoding = fe

        self.backbone = _Stack(wide, nhead, 4 * d, layers)

        (act_c,), aud_c = classes
        bias = -math.log((1 - 0.01) / 0.01)
        ch = nn.Module()
        ch.fc_visual_action = nn.Linear(wide, act_c)
        ch.fc_audio_action = nn.Linear(wide, aud_c)
        nn.init.constant_(ch.fc_visual_action.bias, bias)
        nn.init.constant_(ch.fc_audio_action.bias, bias)
        self.cls_head = ch

        def reg():
            return nn.Sequential(
                nn.Linear(wide, wide // 2), nn.ReLU(),
                nn.Linear(wide // 2, wide // 2), nn.ReLU(),
                nn.Linear(wide // 2, 2), nn.Sigmoid())

        rh = nn.Module()
        rh.fc_visual_action = reg()
        rh.fc_audio_action = reg()
        self.reg_head = rh

        self.drloc_mlp = nn.Sequential(
            nn.Linear(2 * wide, d), nn.ReLU(), nn.Linear(d, d), nn.ReLU(),
            nn.Linear(d, 1))

    def forward(self, v, a, times, nv, na):
        b, f = v.shape[0], v.shape[1]
        fe = self.feature_encoding
        te = self.time_mlp(times)
        vis = torch.cat([fe.visual_embedder(v), te[:, :f]], -1) \
            + fe.visual_modality_encoding
        aud = torch.cat([fe.audio_embedder(a), te[:, f:2 * f]], -1) \
            + fe.audio_modality_encoding
        qte = te[:, 2 * f:]
        parts = [vis, aud]
        parts.append(torch.cat(
            [fe.visual_action_cls.expand(b, nv, -1), qte[:, :nv]], -1)
            + fe.visual_modality_encoding)
        parts.append(torch.cat(
            [fe.audio_action_cls.expand(b, na, -1), qte[:, -na:]], -1)
            + fe.audio_modality_encoding)
        x = torch.cat(parts, 1).transpose(0, 1)

        mask = _tim_mask(x.shape[0], 2 * f, self.nhead, b)
        x = self.backbone(x, mask).transpose(0, 1)

        aud_start = x.shape[1] - na
        vis_start = aud_start - nv
        vq, aq = x[:, vis_start:aud_start], x[:, aud_start:]
        return (
            self.cls_head.fc_visual_action(vq),
            self.cls_head.fc_audio_action(aq),
            self.reg_head.fc_visual_action(vq),
            self.reg_head.fc_audio_action(aq),
            x[:, :2 * f],
        )
