"""Shared flax building blocks and torch-compatible initializers.

Initializer choices replicate the *distributions* torch uses so that
training-from-scratch dynamics match the reference recipe; exact-value
parity with released checkpoints comes from the converter
(``tim_tpu/convert/torch_import.py``), not from init.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

# torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in)).
torch_linear_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_linear_bias_init(key, shape, dtype=jnp.float32, fan_in=None):
    # torch Linear bias: U(+-1/sqrt(fan_in)). Flax passes only the bias shape,
    # so the caller binds fan_in via functools.partial where it matters; the
    # zero fallback is harmless for LayerNorm'd stacks.
    if fan_in is None:
        return jnp.zeros(shape, dtype)
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


xavier_uniform = nn.initializers.xavier_uniform()
cls_token_init = nn.initializers.normal(stddev=0.01)


def mha_packed_qkv_init(key, shape, dtype=jnp.float32):
    """torch ``nn.MultiheadAttention`` xavier-inits ONE packed
    ``[3d, d]`` in-proj matrix, so each of q/k/v draws from
    U(+-sqrt(6/(d + 3d))) — wider-fan-out xavier than a per-matrix
    ``[d, d]`` init would give. Used for the q/k/v kernels so
    training-from-scratch matches the reference recipe
    (``torch/nn/modules/activation.py`` ``_reset_parameters``)."""
    fan_in = shape[0]
    bound = (6.0 / (4.0 * fan_in)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def exact_gelu(x):
    """erf-based GELU. torch ``F.gelu`` defaults to the exact form while
    ``jax.nn.gelu`` defaults to tanh-approximate — parity requires exact."""
    return jax.nn.gelu(x, approximate=False)


class TorchLinear(nn.Module):
    """Dense layer with torch-default init (kaiming-uniform kernel,
    U(+-1/sqrt(fan_in)) bias). ``weights(fan_in)`` exposes the raw params
    for fused Pallas paths that consume them directly."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def weights(self, fan_in: int):
        kernel = self.param(
            "kernel", torch_linear_kernel_init, (fan_in, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias",
            lambda key, shape: torch_linear_bias_init(
                key, shape, fan_in=fan_in),
            (self.features,),
        )
        return kernel, bias

    def __call__(self, x):
        kernel, bias = self.weights(x.shape[-1])
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                    preferred_element_type=jnp.float32)
        return (y + bias.astype(jnp.float32)).astype(self.dtype)


class LayerNormParams(nn.Module):
    """Parameter twin of ``nn.LayerNorm``: creates the identical
    (scale, bias) params (names, shapes, init, fp32) and returns them
    without applying the norm — for fused Pallas paths. A module named
    ``normX`` is checkpoint-interchangeable with an ``nn.LayerNorm`` of
    the same name."""

    @nn.compact
    def __call__(self, dim: int):
        scale = self.param("scale", nn.initializers.ones, (dim,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,),
                          jnp.float32)
        return scale, bias


class Int8Dense(nn.Module):
    """Drop-in Dense for quantized inference: int8 per-out-channel weights
    (``tim_tpu/ops/quant.py``). Params (kernel_q, kernel_scale, bias) are
    produced offline by ``quantize_params`` from a trained fp32 tree.

    Activation quantization:
    - ``static_acts=False``: dynamic per-row abs-max scales (safe default,
      no calibration needed, costs an extra VPU pass);
    - ``static_acts=True`` + ``act_scale_const > 0``: a calibrated
      per-layer scale baked as a *compile-time constant* — XLA folds the
      reciprocal into the quantize and the epilogue (measured 1100 vs 865
      win/s for the same scale carried as a traced param);
    - ``static_acts=True`` with ``act_scale_const == 0``: the scale is
      read from the ``act_scale`` param (portable fallback).
    When the ``calibration`` collection is mutable the layer sows its
    observed input abs-max (``ops.quant.calibrate_act_scales``)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    static_acts: bool = False
    act_scale_const: float = 0.0
    # Mosaic fused quantize->int8 MXU->dequant kernel (ops/pallas_int8):
    # measured +7.6% on the wide 3806-class head matmul, LOSES on FFN
    # shapes (docs/PERFORMANCE.md) — wire per-layer, requires static
    # act_scale_const and a TPU backend.
    pallas_fused: bool = False

    @nn.compact
    def __call__(self, x):
        from tim_tpu.ops.quant import int8_matmul, int8_matmul_static

        fan_in = x.shape[-1]
        kernel_q = self.param(
            "kernel_q", lambda k, s: jnp.zeros(s, jnp.int8),
            (fan_in, self.features))
        scale = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,),
            jnp.float32)
        if self.is_mutable_collection("calibration"):
            self.sow("calibration", "act_absmax",
                     jnp.max(jnp.abs(x)).astype(jnp.float32),
                     init_fn=lambda: jnp.float32(0.0),
                     reduce_fn=jnp.maximum)
        if (self.pallas_fused and self.static_acts
                and self.act_scale_const > 0.0):
            from tim_tpu.ops.pallas_int8 import (
                int8_matmul_fused, supports_pallas_int8)
            if supports_pallas_int8():
                bias = (self.param("bias", nn.initializers.zeros,
                                   (self.features,), jnp.float32)
                        if self.use_bias else None)
                return int8_matmul_fused(
                    x, kernel_q, scale, self.act_scale_const, bias=bias,
                    block_m=256, out_dtype=self.dtype)
            # non-TPU: fall through to the XLA static path below
        if self.static_acts and self.act_scale_const > 0.0:
            y = int8_matmul_static(x, kernel_q, scale,
                                   self.act_scale_const)
        elif self.static_acts:
            act_scale = self.param("act_scale", nn.initializers.ones, (),
                                   jnp.float32)
            y = int8_matmul_static(x, kernel_q, scale, act_scale)
        else:
            y = int8_matmul(x, kernel_q, scale)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias
        return y.astype(self.dtype)


class MLP(nn.Module):
    """Stack of TorchLinear+ReLU used by time_mlp / drloc / reg heads."""

    hidden: tuple
    dtype: jnp.dtype = jnp.float32
    final_activation: str = "none"   # none | relu | sigmoid

    @nn.compact
    def __call__(self, x):
        for i, h in enumerate(self.hidden):
            x = TorchLinear(h, dtype=self.dtype, name=f"fc{i}")(x)
            if i < len(self.hidden) - 1:
                x = nn.relu(x)
        if self.final_activation == "relu":
            x = nn.relu(x)
        elif self.final_activation == "sigmoid":
            x = nn.sigmoid(x)
        return x
