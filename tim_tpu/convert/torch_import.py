"""Convert reference TIM torch checkpoints into tim_tpu flax params.

The reference releases trained ``state_dict`` checkpoints
(``recognition/README.md:15-20``, ``detection/README.md:24-30``). This
module maps their key layout onto our param tree so users can run released
models on TPU without retraining. Works on plain dict-of-numpy — torch is
only needed by the caller to unpickle the file.

Key layout mapped (recognition variant, ``recognition/.../models/tim.py``):
  time_mlp.{0,2,4}.*             -> time_mlp/fc{0,1,2}
  time_mlp.6.*                   -> time_norm
  feature_encoding.*_embedder.1  -> feature_encoding/*_embedder/proj
  feature_encoding.*_embedder.3  -> feature_encoding/*_embedder/norm
  feature_encoding.<cls tokens>  -> feature_encoding/<same name>
  transformer_encoder.layers.N   -> encoder/layerN (in_proj split to q/k/v)
  cls_head.fc_visual_verb etc.   -> cls_head/fc_verb etc.
  drloc_mlp.{0,2,4}              -> drloc_mlp/fc{0,1,2}
Detection adds ``backbone`` (same encoder), reg heads, and drops verb/noun
CLS tokens (``detection/.../models/tim.py``).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _strip_wrapper(sd: Mapping) -> Mapping:
    """Drop a uniform DataParallel/compile wrapper prefix if present.
    The reference saves ``model.module.state_dict()`` for multi-GPU runs
    (``recognition/scripts/train.py:139``) so released files should be
    bare, but files saved from a wrapped model still convert."""
    changed = True
    while changed and sd:
        changed = False
        for prefix in ("module.", "_orig_mod."):
            if all(k.startswith(prefix) for k in sd):
                sd = {k[len(prefix):]: v for k, v in sd.items()}
                changed = True
    return sd


def _linear(sd: Mapping, prefix: str) -> Dict:
    # torch Linear stores weight [out, in]; flax kernel is [in, out].
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).T,
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _norm(sd: Mapping, prefix: str) -> Dict:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _mlp(sd: Mapping, prefix: str, indices) -> Dict:
    return {f"fc{i}": _linear(sd, f"{prefix}.{j}")
            for i, j in enumerate(indices)}


def _encoder_layer(sd: Mapping, prefix: str, d_model: int) -> Dict:
    w = _np(sd[f"{prefix}.self_attn.in_proj_weight"])
    b = _np(sd[f"{prefix}.self_attn.in_proj_bias"])
    d = d_model
    attn = {
        "q": {"kernel": w[:d].T, "bias": b[:d]},
        "k": {"kernel": w[d:2 * d].T, "bias": b[d:2 * d]},
        "v": {"kernel": w[2 * d:].T, "bias": b[2 * d:]},
        "out": _linear(sd, f"{prefix}.self_attn.out_proj"),
    }
    return {
        "self_attn": attn,
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "linear1": _linear(sd, f"{prefix}.linear1"),
        "linear2": _linear(sd, f"{prefix}.linear2"),
    }


def _feature_encoding(sd: Mapping, detection: bool) -> Dict:
    fe: Dict = {}
    for mod in ("visual", "audio"):
        if f"feature_encoding.{mod}_embedder.1.weight" in sd:
            fe[f"{mod}_embedder"] = {
                "proj": _linear(sd, f"feature_encoding.{mod}_embedder.1"),
                "norm": _norm(sd, f"feature_encoding.{mod}_embedder.3"),
            }
    token_names = [
        "visual_modality_encoding", "audio_modality_encoding",
        "visual_action_cls", "audio_action_cls",
    ]
    if not detection:
        token_names += ["visual_verb_cls", "visual_noun_cls"]
        # visual-only / audio-only recognition models name tokens without
        # the modality prefix (``recognition/.../encodings.py:29-35,95``).
        alias = {"action_cls": "visual_action_cls",
                 "verb_cls": "visual_verb_cls",
                 "noun_cls": "visual_noun_cls"}
    else:
        alias = {}
    for name in token_names:
        key = f"feature_encoding.{name}"
        if key in sd:
            fe[name] = _np(sd[key])
    for src, dst in alias.items():
        key = f"feature_encoding.{src}"
        if key in sd and dst not in fe:
            fe[dst] = _np(sd[key])
    # audio-only models call the token ``action_cls`` too
    if "feature_encoding.action_cls" in sd and "visual_embedder" not in fe \
            and "audio_action_cls" not in fe:
        fe["audio_action_cls"] = _np(sd["feature_encoding.action_cls"])
    return fe


def _cls_head(sd: Mapping) -> Dict:
    mapping = {
        "fc_visual_verb": "fc_verb",
        "fc_visual_noun": "fc_noun",
        "fc_visual_action": "fc_action",
        "fc_audio_action": "fc_audio",
    }
    out = {}
    for src, dst in mapping.items():
        if f"cls_head.{src}.weight" in sd:
            out[dst] = _linear(sd, f"cls_head.{src}")
    return out


def recognition_params_from_torch(
    state_dict: Mapping, d_model: int = 512, num_layers: int = 4
) -> Dict:
    """Reference recognition ``state_dict`` -> ``{'params': ...}`` pytree."""
    sd = _strip_wrapper(state_dict)
    width = 2 * d_model
    params = {
        "time_mlp": _mlp(sd, "time_mlp", (0, 2, 4)),
        "time_norm": _norm(sd, "time_mlp.6"),
        "feature_encoding": _feature_encoding(sd, detection=False),
        "encoder": {
            f"layer{i}": _encoder_layer(
                sd, f"transformer_encoder.layers.{i}", width)
            for i in range(num_layers)
        },
        "cls_head": _cls_head(sd),
        "drloc_mlp": _mlp(sd, "drloc_mlp", (0, 2, 4)),
    }
    if "pool.affine_audio.weight" in sd:
        params["pool"] = {
            "affine_audio": _linear(sd, "pool.affine_audio"),
            "affine_video": _linear(sd, "pool.affine_video"),
            "affine_v": {"kernel": _np(sd["pool.affine_v.weight"]).T},
            "affine_g": {"kernel": _np(sd["pool.affine_g.weight"]).T},
            "affine_h": {"kernel": _np(sd["pool.affine_h.weight"]).T},
        }
    return {"params": params}


def detection_params_from_torch(
    state_dict: Mapping, d_model: int = 512, num_layers: int = 6
) -> Dict:
    """Reference detection ``state_dict`` -> ``{'params': ...}`` pytree."""
    sd = _strip_wrapper(state_dict)
    width = 2 * d_model
    params = {
        "time_mlp": _mlp(sd, "time_mlp", (0, 2, 4)),
        "time_norm": _norm(sd, "time_mlp.6"),
        "feature_encoding": _feature_encoding(sd, detection=True),
        "encoder": {
            f"layer{i}": _encoder_layer(sd, f"backbone.layers.{i}", width)
            for i in range(num_layers)
        },
        "cls_head": _cls_head(sd),
        "drloc_mlp": _mlp(sd, "drloc_mlp", (0, 2, 4)),
    }
    reg = {}
    if "reg_head.fc_visual_action.0.weight" in sd:
        reg["reg_visual"] = _mlp(sd, "reg_head.fc_visual_action", (0, 2, 4))
    if "reg_head.fc_audio_action.0.weight" in sd:
        reg["reg_audio"] = _mlp(sd, "reg_head.fc_audio_action", (0, 2, 4))
    params["reg_head"] = reg
    return {"params": params}
