"""Classification and regression heads.

Recognition heads slice per-task CLS tokens off the sequence tail in order
verb -> noun -> action -> audio (``recognition/.../helpers/head.py:4-81``).
Detection heads share the visual query tokens across verb/noun/action
linears and add sigmoid interval-regression MLPs with focal-init bias
(``detection/.../helpers/head.py:7-163``).

Outputs keep the [B, Nq, C] shape (the reference flattens to [B*Nq, C];
flattening happens in the loss)."""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from tim_tpu.models.common import (
    Int8Dense, MLP, TorchLinear, torch_linear_kernel_init)
from tim_tpu.ops.quant import scale_for

FOCAL_BIAS = -math.log((1 - 0.01) / 0.01)


def _focal_linear(features: int, dtype, name: str, quantized: bool = False,
                  static_acts: bool = False, act_scale: float = 0.0,
                  pallas_fused: bool = False):
    """Linear whose bias starts at the RetinaNet prior
    (``detection/.../head.py:12-25``)."""
    if quantized:
        return Int8Dense(features, dtype=dtype, static_acts=static_acts,
                         act_scale_const=act_scale,
                         pallas_fused=pallas_fused, name=name)
    return nn.Dense(
        features, dtype=dtype, param_dtype=jnp.float32,
        kernel_init=torch_linear_kernel_init,
        bias_init=nn.initializers.constant(FOCAL_BIAS), name=name,
    )


class RecognitionClsHead(nn.Module):
    """Per-task linears over tail-sliced CLS tokens.

    visual_classes: (verb, noun, action) or (action,).
    audio_classes: int or None (no audio head).
    """

    visual_classes: Optional[Tuple[int, ...]]
    audio_classes: Optional[int]
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False
    quant_static_acts: bool = False
    act_scales: tuple = ()

    @nn.compact
    def __call__(self, x, num_v_queries: int, num_a_queries: int):
        s = x.shape[1]
        dense = (lambda n, name: Int8Dense(
            n, dtype=self.dtype, static_acts=self.quant_static_acts,
            act_scale_const=scale_for(self.act_scales, name),
            name=name)) \
            if self.quantized else \
            (lambda n, name: TorchLinear(n, dtype=self.dtype, name=name))
        include_vn = (self.visual_classes is not None
                      and len(self.visual_classes) == 3)
        aud_start = s - num_a_queries if num_a_queries > 0 else s
        act_start = aud_start - num_v_queries

        verb = noun = action = audio = None
        if self.visual_classes is not None and num_v_queries > 0:
            if include_vn:
                noun_start = act_start - num_v_queries
                verb_start = noun_start - num_v_queries
                verb = dense(self.visual_classes[0],
                             "fc_verb")(x[:, verb_start:noun_start])
                noun = dense(self.visual_classes[1],
                             "fc_noun")(x[:, noun_start:act_start])
            action = dense(self.visual_classes[-1],
                           "fc_action")(x[:, act_start:aud_start])
        if self.audio_classes is not None and num_a_queries > 0:
            audio = dense(self.audio_classes,
                          "fc_audio")(x[:, aud_start:])
        return verb, noun, action, audio


class DetectionClsHead(nn.Module):
    """Shared-query detection classifier with focal bias init."""

    visual_classes: Optional[Tuple[int, ...]]
    audio_classes: Optional[int]
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False
    quant_static_acts: bool = False
    act_scales: tuple = ()
    pallas_fused: bool = False

    @nn.compact
    def __call__(self, x, num_v_queries: int, num_a_queries: int):
        s = x.shape[1]
        aud_start = s - num_a_queries if num_a_queries > 0 else s
        vis_start = aud_start - num_v_queries

        def fl(features, name):
            return _focal_linear(
                features, self.dtype, name, self.quantized,
                self.quant_static_acts,
                scale_for(self.act_scales, name), self.pallas_fused)

        verb = noun = action = audio = None
        if self.visual_classes is not None and num_v_queries > 0:
            vx = x[:, vis_start:aud_start]
            include_vn = len(self.visual_classes) == 3
            if include_vn:
                verb = fl(self.visual_classes[0], "fc_verb")(vx)
                noun = fl(self.visual_classes[1], "fc_noun")(vx)
            action = fl(self.visual_classes[-1], "fc_action")(vx)
        if self.audio_classes is not None and num_a_queries > 0:
            audio = fl(self.audio_classes, "fc_audio")(x[:, aud_start:])
        return verb, noun, action, audio


class DetectionRegHead(nn.Module):
    """Per-modality 3-layer sigmoid MLP -> normalized [start, end]
    (``detection/.../head.py:95-163``)."""

    has_visual: bool
    has_audio: bool
    d_model: int       # encoder width (2 * d_model of config)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, num_v_queries: int, num_a_queries: int):
        s = x.shape[1]
        aud_start = s - num_a_queries if num_a_queries > 0 else s
        vis_start = aud_start - num_v_queries

        def reg_mlp(name):
            return MLP((self.d_model // 2, self.d_model // 2, 2),
                       dtype=self.dtype, final_activation="sigmoid",
                       name=name)

        v_reg = a_reg = None
        if self.has_visual and num_v_queries > 0:
            v_reg = reg_mlp("reg_visual")(x[:, vis_start:aud_start])
        if self.has_audio and num_a_queries > 0:
            a_reg = reg_mlp("reg_audio")(x[:, aud_start:])
        return v_reg, a_reg
