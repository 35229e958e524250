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
