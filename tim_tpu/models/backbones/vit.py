"""VideoMAE vision transformer (feature-extraction backbone).

TPU-native rebuild of ``feature_extractors/VideoMAE/modeling_finetune.py``:
tubelet Conv3D patch embedding, fixed sin-cos position table, pre-norm ViT
blocks with VideoMAE's packed qkv (no k bias) and optional layer scale,
mean-pooled ``forward_features`` -> ``fc_norm`` (1024-d for ViT-L). Used to
produce the per-timestep visual features TIM consumes (merged with
Omnivore via ``merge_features``).
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from tim_tpu.models.common import exact_gelu


def sinusoid_position_table(n_position: int, d_hid: int) -> np.ndarray:
    """Classic sin/cos table (``modeling_finetune.py:224-241``)."""
    pos = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


def _flash_block_sizes(s: int):
    """Forward-only full-sequence blocks for the Pallas TPU flash
    kernel (kept for the micro-benches; the model path goes through
    ``tim_tpu.ops.flash.flash_mha``, whose pad-to-128 contract also
    makes the kernel's backward legal at ViT-L's S=1568)."""
    from tim_tpu.ops.flash import _full_block_sizes

    return _full_block_sizes(s)


class VideoMAEAttention(nn.Module):
    """Packed qkv projection with q/v biases only (k bias fixed at zero),
    matching the checkpoint layout (``modeling_finetune.py:75-129``).

    ``use_flash``: route the softmax-attention core through the public
    Pallas TPU flash kernel instead of materializing the [B, H, S, S]
    score tensor (~157 MB fp32 per clip-layer at ViT-L's S=1568 — the
    measured attention core drops 8.03 -> 4.23 ms per batch-8 layer).
    Exact softmax attention with fp32 online accumulators; measured
    output delta vs the XLA path is ~3e-5 (bf16 rounding). TPU-only —
    leave False on CPU backends (no interpret fallback)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    quantized: bool = False
    act_scales: tuple = ()

    @nn.compact
    def __call__(self, x):
        from tim_tpu.models.common import Int8Dense
        from tim_tpu.ops.quant import scale_for

        b, n, _ = x.shape
        d = self.dim
        head_dim = d // self.num_heads
        scale = head_dim ** -0.5

        if self.quantized:
            # int8 serving path: the packed qkv kernel lives in an
            # Int8Dense child (``quantize_backbone_params`` moves the
            # fp32 ``qkv_kernel`` leaf there); q/v biases stay separate
            # to preserve the VideoMAE no-k-bias layout. Calibrated
            # scales run as compile-time constants; without them the
            # layer falls back to dynamic per-row act quantization
            # (which is also the calibration pass).
            const = scale_for(self.act_scales, "qkv")
            qkv = Int8Dense(3 * d, use_bias=False, dtype=jnp.float32,
                            static_acts=const > 0.0,
                            act_scale_const=const, name="qkv")(x)
        else:
            qkv_kernel = self.param(
                "qkv_kernel", nn.initializers.truncated_normal(0.02),
                (d, 3 * d), jnp.float32)
            qkv = jnp.dot(x.astype(self.dtype),
                          qkv_kernel.astype(self.dtype),
                          preferred_element_type=jnp.float32)
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (d,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (d,))
            bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
            qkv = qkv + bias
        qkv = qkv.astype(self.dtype).reshape(
            b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B,N,H,dh]

        if self.use_flash:
            from tim_tpu.ops.flash import flash_mha

            out = flash_mha(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), sm_scale=float(scale))
            out = out.transpose(0, 2, 1, 3)
        else:
            attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                             preferred_element_type=jnp.float32)
        out = out.reshape(b, n, d).astype(self.dtype)
        if self.quantized:
            const = scale_for(self.act_scales, "proj")
            return Int8Dense(d, dtype=self.dtype, static_acts=const > 0.0,
                             act_scale_const=const, name="proj")(out)
        # reference _init_weights: every nn.Linear is trunc_normal(0.02)
        # with zero bias (modeling_finetune.py:342-347) — matters for
        # from-scratch MAE pretraining, not checkpoint-loaded inference
        return nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=nn.initializers.truncated_normal(0.02),
                        name="proj")(out)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    init_values: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    quantized: bool = False
    act_scales: tuple = ()
    # Rematerialize ONLY the LN2+MLP sub-block (jax.checkpoint). Drops
    # the [B, S, 4*dim] fc1/gelu residuals — the dominant remaining
    # activation once flash attention removes the softmax probs — while
    # keeping the Pallas flash custom_vjp OUTSIDE the remat region
    # (whole-block nn.remat around the flash kernel crashes the TPU
    # compiler; measured round 5).
    remat_mlp: bool = False

    def _mlp(self, x):
        from tim_tpu.models.common import Int8Dense
        from tim_tpu.ops.quant import scale_for

        if self.quantized:
            def dense(feats, name):
                const = scale_for(self.act_scales, name)
                return Int8Dense(feats, dtype=self.dtype,
                                 static_acts=const > 0.0,
                                 act_scale_const=const, name=name)
        else:
            def dense(feats, name):
                return nn.Dense(
                    feats, dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=nn.initializers.truncated_normal(0.02),
                    name=name)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        h = dense(int(self.dim * self.mlp_ratio), "fc1")(
            h.astype(self.dtype))
        h = exact_gelu(h)
        h = dense(self.dim, "fc2")(h)
        if self.init_values > 0:
            gamma_2 = self.param(
                "gamma_2", nn.initializers.constant(self.init_values),
                (self.dim,))
            h = h * gamma_2.astype(self.dtype)
        return h

    @nn.compact
    def __call__(self, x):
        from tim_tpu.ops.quant import filter_scales

        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = VideoMAEAttention(self.dim, self.num_heads, dtype=self.dtype,
                              use_flash=self.use_flash,
                              quantized=self.quantized,
                              act_scales=filter_scales(
                                  self.act_scales, "attn"),
                              name="attn")(h.astype(self.dtype))
        if self.init_values > 0:
            gamma_1 = self.param(
                "gamma_1", nn.initializers.constant(self.init_values),
                (self.dim,))
            h = h * gamma_1.astype(self.dtype)
        x = x + h

        mlp = (nn.remat(ViTBlock._mlp) if self.remat_mlp
               else ViTBlock._mlp)
        return x + mlp(self, x)


class VideoMAEViT(nn.Module):
    """forward_features path: video [B, T, H, W, 3] -> feature [B, D]."""

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_frames: int = 16
    tubelet_size: int = 2
    init_values: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    # int8 serving (TPU-native, no reference counterpart): weights from
    # ``ops.quant.quantize_backbone_params``, static activation scales
    # from ``ops.quant.calibrate_act_scales`` baked as compile-time
    # constants (the lever that won 1.37x on the TIM serving matmuls).
    quantized: bool = False
    act_scales: tuple = ()
    # Rematerialize each block in the backward pass (jax.checkpoint).
    # Training-memory knob: trades ~1 extra forward for dropping all
    # block activations from the autodiff residuals, unlocking larger
    # finetune batches (the reference leans on DeepSpeed ZeRO for the
    # same problem, ``run_class_finetuning.py``). No effect on inference.
    # NOTE: incompatible with use_flash — whole-block remat around the
    # Pallas custom_vjp crashes the TPU compiler (round 5); use
    # remat_mlp with flash instead.
    remat: bool = False
    # MLP-only remat: drops the [B, S, 4096] fc1/gelu residuals while
    # keeping the flash kernel outside the checkpoint region. Composes
    # with use_flash.
    remat_mlp: bool = False

    @nn.compact
    def __call__(self, video, *, embed_only: bool = False,
                 embedded: bool = False):
        """``embed_only``: return the tubelet embedding only — a
        per-frame-pair map [B, T/2, H/ps, W/ps, C] with no cross-pair
        coupling (VALID conv, stride == kernel) and NO position table
        (positions depend on where a pair sits in its clip, so the table
        is added after clip assembly). ``embedded``: ``video`` is already
        that embedding; skip the conv. Together they let dense 0.2s-hop
        extraction embed each unique frame pair once
        (``extract/dense_media.py``)."""
        from tim_tpu.ops.quant import filter_scales
        if embedded:
            b = video.shape[0]
            x = video.astype(self.dtype)
        else:
            b = video.shape[0]
            x = nn.Conv(
                self.embed_dim,
                kernel_size=(self.tubelet_size, self.patch_size,
                             self.patch_size),
                strides=(self.tubelet_size, self.patch_size,
                         self.patch_size),
                padding="VALID", dtype=self.dtype, param_dtype=jnp.float32,
                name="patch_embed")(video.astype(self.dtype))
        if embed_only:
            return x
        x = x.reshape(b, -1, self.embed_dim)

        pos = sinusoid_position_table(x.shape[1], self.embed_dim)
        x = x + jnp.asarray(pos, self.dtype)[None]

        block_cls = nn.remat(ViTBlock) if self.remat else ViTBlock
        for i in range(self.depth):
            x = block_cls(self.embed_dim, self.num_heads, self.mlp_ratio,
                          self.init_values, self.dtype,
                          use_flash=self.use_flash,
                          quantized=self.quantized,
                          act_scales=filter_scales(
                              self.act_scales, f"block{i}"),
                          remat_mlp=self.remat_mlp,
                          name=f"block{i}")(x)

        x = jnp.mean(x.astype(jnp.float32), axis=1)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="fc_norm")(x)
        return x.astype(self.dtype)


def videomae_vit_large(dtype="float32", use_flash=False,
                       quantized=False) -> VideoMAEViT:
    # quantized=True runs the matmuls int8 with dynamic per-row act
    # scales — measured 0.90x bf16 at b8+flash (13.3 vs 14.7 ms/clip,
    # docs/PERFORMANCE.md round 4); params must come from
    # ``ops.quant.quantize_backbone_params``.
    return VideoMAEViT(embed_dim=1024, depth=24, num_heads=16,
                       dtype=jnp.dtype(dtype), use_flash=use_flash,
                       quantized=quantized)


def params_from_torch(state_dict, depth: int = 24) -> dict:
    """Reference VideoMAE checkpoint -> flax params. Conv3d kernels move
    from [O, I, T, H, W] to flax's [T, H, W, I, O]."""

    def _np(x):
        return np.asarray(x.detach().cpu().numpy()
                          if hasattr(x, "detach") else x)

    sd = state_dict
    params = {
        "patch_embed": {
            "kernel": _np(sd["patch_embed.proj.weight"]).transpose(
                2, 3, 4, 1, 0),
            "bias": _np(sd["patch_embed.proj.bias"]),
        },
        "fc_norm": {
            "scale": _np(sd["fc_norm.weight"]),
            "bias": _np(sd["fc_norm.bias"]),
        },
    }
    for i in range(depth):
        p = f"blocks.{i}"
        block = {
            "norm1": {"scale": _np(sd[f"{p}.norm1.weight"]),
                      "bias": _np(sd[f"{p}.norm1.bias"])},
            "norm2": {"scale": _np(sd[f"{p}.norm2.weight"]),
                      "bias": _np(sd[f"{p}.norm2.bias"])},
            "attn": {
                "qkv_kernel": _np(sd[f"{p}.attn.qkv.weight"]).T,
                "q_bias": _np(sd[f"{p}.attn.q_bias"]),
                "v_bias": _np(sd[f"{p}.attn.v_bias"]),
                "proj": {"kernel": _np(sd[f"{p}.attn.proj.weight"]).T,
                         "bias": _np(sd[f"{p}.attn.proj.bias"])},
            },
            "fc1": {"kernel": _np(sd[f"{p}.mlp.fc1.weight"]).T,
                    "bias": _np(sd[f"{p}.mlp.fc1.bias"])},
            "fc2": {"kernel": _np(sd[f"{p}.mlp.fc2.weight"]).T,
                    "bias": _np(sd[f"{p}.mlp.fc2.bias"])},
        }
        if f"{p}.gamma_1" in sd:
            block["gamma_1"] = _np(sd[f"{p}.gamma_1"])
            block["gamma_2"] = _np(sd[f"{p}.gamma_2"])
        params[f"block{i}"] = block
    return {"params": params}
