"""Int8 quantized inference path.

v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 FLOP rate (measured
~1.3x end-to-end on big matmuls here). For serving, the encoder stack and
the wide classifier heads run with:

- weights: symmetric per-output-channel int8 (``quantize_kernel``),
  converted offline from the fp32 checkpoint;
- activations: dynamic symmetric per-row int8, quantized on the fly.

The reference has no quantized path (fp16 autocast only); this is a
TPU-native serving optimization, strictly opt-in via
``ModelConfig.quantized_inference``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def quantize_kernel(w) -> Tuple[np.ndarray, np.ndarray]:
    """fp kernel [in, out] -> (int8 kernel, fp32 per-out-channel scale)."""
    w = np.asarray(w, np.float32)
    scale = np.max(np.abs(w), axis=0) / 127.0
    scale = np.maximum(scale, 1e-12)
    w_q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return w_q, scale.astype(np.float32)


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray,
                scale: jnp.ndarray) -> jnp.ndarray:
    """Dynamic-activation int8 matmul: x [..., in] fp -> [..., out] fp32.

    Per-row activation scales keep the quantization error proportional to
    each token's magnitude (LayerNorm'd activations are well-behaved)."""
    x32 = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    s_x = jnp.maximum(s_x, 1e-12)
    x_q = jnp.clip(jnp.round(x32 / s_x), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (s_x * scale)


def scale_for(act_scales, name: str, default: float = 0.0) -> float:
    """Look up a layer's calibrated activation scale in a
    (path, scale) tuple (paths are '/'-joined param paths).

    A miss against a NON-empty tuple is almost always a calibration /
    path-naming bug (the layer would silently fall back to the traced
    ``act_scale`` param, ones-init unless calibrated, collapsing int8
    precision) — warn loudly instead of failing silent."""
    for path, s in act_scales:
        if path == name:
            return float(s)
    if act_scales:
        import logging
        logging.getLogger(__name__).warning(
            "scale_for: no calibrated activation scale for %r (tuple has "
            "%d entries, e.g. %r) — falling back to the traced act_scale "
            "param; if that param is not calibrated, int8 accuracy "
            "collapses", name, len(act_scales), act_scales[0][0])
    return default


def filter_scales(act_scales, prefix: str):
    """Sub-tuple of scales under ``prefix`` with the prefix stripped."""
    pre = prefix + "/"
    return tuple((p[len(pre):], s) for p, s in act_scales
                 if p.startswith(pre))


def int8_matmul_static(x: jnp.ndarray, w_q: jnp.ndarray,
                       scale: jnp.ndarray,
                       act_scale) -> jnp.ndarray:
    """Static-activation int8 matmul: one calibrated per-layer scale (pass
    a python float to bake it as a compile-time constant), no abs-max
    reduction over the activations."""
    s_x = jnp.maximum(act_scale, 1e-12)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                   -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (s_x * scale)


def calibrate_act_scales(apply_fn, variables, batches) -> Dict:
    """Run calibration batches through a model whose Int8Dense layers sow
    their input abs-max, and return params with per-layer ``act_scale``
    entries filled in (abs-max / 127).

    apply_fn(variables, batch, mutable) -> (out, mutated) must forward the
    ``mutable`` list to ``module.apply``."""
    absmax: Dict = {}

    def merge(tree, into, path=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                merge(v, into, path + (k,))
            else:
                key = path + (k,)
                prev = into.get(key)
                val = np.asarray(jax.tree_util.tree_leaves(v)[0]
                                 if isinstance(v, (tuple, list)) else v)
                into[key] = val if prev is None else np.maximum(prev, val)

    for batch in batches:
        _, mut = apply_fn(variables, batch, ["calibration"])
        merge(mut.get("calibration", {}), absmax)

    params = jax.device_get(variables["params"])

    def walk(node, path=()):
        if not isinstance(node, dict):
            return node
        out = {k: walk(v, path + (k,)) for k, v in node.items()}
        if "kernel_q" in node:
            key = path + ("act_absmax",)
            if key in absmax:
                out["act_scale"] = jnp.float32(
                    max(float(absmax[key]) / 127.0, 1e-12))
        return out

    return walk(params)


def act_scales_tuple(calibrated_params) -> tuple:
    """Flatten calibrated ``act_scale`` leaves into the hashable
    (path, scale) tuple ``ModelConfig.quant_act_scales`` consumes."""
    out = []

    def walk(node, path=()):
        if not isinstance(node, dict):
            return
        for k, v in node.items():
            if k == "act_scale":
                out.append(("/".join(path), float(v)))
            elif isinstance(v, dict):
                walk(v, path + (k,))

    walk(calibrated_params)
    return tuple(sorted(out))


# Backbone matmuls that carry ~99% of extraction FLOPs (Swin/ViT qkv,
# attention out-proj, FFN). Conv patch embeds, LayerNorms, and the tiny
# PatchMerging reductions stay fp32/bf16.
BACKBONE_QUANT_MODULES = ("qkv", "proj", "fc1", "fc2")


def quantize_backbone_params(params: Dict) -> Dict:
    """fp32 backbone param tree (Swin3D / VideoMAE ViT) -> tree matching
    the modules' ``quantized=True`` layout: 2-D kernels under
    qkv/proj/fc1/fc2 become (kernel_q, kernel_scale); the ViT's packed
    ``qkv_kernel`` leaf moves into an Int8Dense-shaped ``qkv`` child
    (its q/v biases stay separate, k bias is structurally zero)."""

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        for key, val in node.items():
            if key == "qkv_kernel":
                w_q, scale = quantize_kernel(val)
                out["qkv"] = {"kernel_q": jnp.asarray(w_q),
                              "kernel_scale": jnp.asarray(scale)}
            elif isinstance(val, dict):
                out[key] = walk(val, path + (key,))
            elif (key == "kernel" and np.ndim(val) == 2 and path
                    and path[-1] in BACKBONE_QUANT_MODULES):
                w_q, scale = quantize_kernel(val)
                out["kernel_q"] = jnp.asarray(w_q)
                out["kernel_scale"] = jnp.asarray(scale)
            else:
                out[key] = val
        return out

    return walk(params, ())


def _is_quantizable(path_names: Tuple[str, ...], leaf) -> bool:
    if path_names[-1] != "kernel" or np.ndim(leaf) != 2:
        return False
    # encoder matmuls + classifier heads carry ~95% of inference FLOPs
    return path_names[0] in ("encoder", "cls_head")


def quantize_params(params: Dict) -> Dict:
    """fp32 param tree -> tree with encoder/cls_head kernels replaced by
    (kernel_q int8, kernel_scale fp32), matching what quantized modules
    (``quantized=True``) expect."""

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        for key, val in node.items():
            sub_path = path + (key,)
            if isinstance(val, dict):
                out[key] = walk(val, sub_path)
            elif _is_quantizable(sub_path, val):
                w_q, scale = quantize_kernel(val)
                out["kernel_q"] = jnp.asarray(w_q)
                out["kernel_scale"] = jnp.asarray(scale)
            else:
                out[key] = val
        return out

    return walk(params, ())
