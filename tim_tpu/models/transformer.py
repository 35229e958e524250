"""Post-norm transformer encoder with structured TIM attention.

Functionally equivalent to the reference's fork of torch's
``nn.TransformerEncoder{,Layer}``
(``recognition/.../models/helpers/transformers.py:13-111``): post-norm
residual blocks, GELU feed-forward, dropout on attention weights and both
residual branches. The attention itself uses the exact structured kernel
(``tim_tpu/ops/attention.py``) instead of a dense [S, S] mask.

Layout is batch-first [B, S, C] throughout (the reference shuttles
[S, B, C] for torch MHA; irrelevant under XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from tim_tpu.models.common import (
    Int8Dense, LayerNormParams, TorchLinear, exact_gelu,
    mha_packed_qkv_init, torch_linear_kernel_init)
from tim_tpu.ops.attention import tim_attention
from tim_tpu.ops.pallas_fused import fused_post_attention, fused_supported
from tim_tpu.ops.quant import filter_scales, scale_for



def _shard_tokens(x):
    """Megatron-SP activation layout: [B, S, D] with S over the 'model'
    mesh axis (post-LN regions). Requires an active mesh (jax.set_mesh);
    GSPMD inserts the boundary collectives. Axes that don't divide their
    mesh dimension stay replicated (e.g. S = 2*nf + queries is rarely a
    multiple of the model axis — pad-free by design)."""
    from jax.sharding import PartitionSpec as P, get_abstract_mesh

    mesh = get_abstract_mesh()
    if mesh is None or mesh.empty:
        return x
    shape = dict(mesh.shape)

    def ok(dim, axis):
        return axis in shape and x.shape[dim] % shape[axis] == 0

    spec = P("data" if ok(0, "data") else None,
             "model" if ok(1, "model") else None, None)
    if spec == P(None, None, None):
        return x
    return jax.lax.with_sharding_constraint(x, spec)

class SelfAttention(nn.Module):
    """Multi-head self-attention with the TIM context/self mask structure.

    Parameters are stored as separate q/k/v/out projections; the torch
    checkpoint converter splits torch's packed ``in_proj_weight`` into these
    (torch MHA packs qkv: ``nn.MultiheadAttention`` internals).
    """

    d_model: int
    nhead: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False
    quant_static_acts: bool = False
    act_scales: tuple = ()
    fast_scores: bool = False
    dropout_bits: int = 32

    @nn.compact
    def __call__(self, x, num_ctx: int, *, deterministic: bool = True,
                 shared_queries: bool = False):
        b, s, c = x.shape
        dh = self.d_model // self.nhead

        def proj(name):
            if self.quantized:
                return Int8Dense(self.d_model, dtype=self.dtype,
                                 static_acts=self.quant_static_acts,
                                 act_scale_const=scale_for(
                                     self.act_scales, name),
                                 name=name)
            # torch MHA init parity: q/k/v draw from the PACKED [3d, d]
            # xavier (bound sqrt(6/4d)); out_proj keeps torch Linear's
            # kaiming-uniform default (bound 1/sqrt(d)); both bias sets
            # start at zero (torch zeroes in_proj_bias and out_proj.bias)
            return nn.Dense(
                self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                kernel_init=(torch_linear_kernel_init if name == "out"
                             else mha_packed_qkv_init), name=name,
            )

        if shared_queries and s > num_ctx and b > 1:
            # Dense inference: query tokens are identical across the batch
            # at this layer, so project one row and broadcast (saves the
            # batch factor on the query-slice q/k/v matmuls).
            xc, xq = x[:, :num_ctx], x[:, num_ctx:]

            def qkv(name):
                mod = proj(name)
                yc = mod(xc)
                yq = jnp.broadcast_to(
                    mod(xq[:1]), (b, s - num_ctx, self.d_model))
                return jnp.concatenate([yc, yq], axis=1)
        else:
            def qkv(name):
                return proj(name)(x)

        q = qkv("q").reshape(b, s, self.nhead, dh).transpose(0, 2, 1, 3)
        k = qkv("k").reshape(b, s, self.nhead, dh).transpose(0, 2, 1, 3)
        v = qkv("v").reshape(b, s, self.nhead, dh).transpose(0, 2, 1, 3)

        if not deterministic and self.dropout > 0.0:
            rng = self.make_rng("dropout")
        else:
            rng = None
        out = tim_attention(
            q, k, v, num_ctx,
            dropout_rate=self.dropout, dropout_rng=rng,
            deterministic=deterministic,
            score_dtype=jnp.bfloat16 if self.fast_scores else None,
            dropout_bits=self.dropout_bits,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, s, self.d_model)
        return proj("out")(out)


class EncoderLayer(nn.Module):
    """Post-norm block: x = LN(x + drop(attn(x))); x = LN(x + drop(ff(x))).

    ``num_ctx``/``deterministic`` are positional so nn.remat can mark them
    static (argnums 2 and 3, with self at 0)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False
    quant_static_acts: bool = False
    act_scales: tuple = ()
    fused_ffn: bool = False
    fast_scores: bool = False
    sequence_parallel: bool = False
    dropout_bits: int = 32

    def _drop(self, x, deterministic: bool):
        """Residual/FFN dropout; ``dropout_bits=8`` swaps the bernoulli
        mask for the 4x-cheaper uint8 mask (``ops/dropout.py``)."""
        if (self.dropout_bits == 8 and not deterministic
                and self.dropout > 0.0):
            from tim_tpu.ops.dropout import coarse_dropout
            return coarse_dropout(self.make_rng("dropout"), x,
                                  self.dropout)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)

    @nn.compact
    def __call__(self, x, num_ctx: int, deterministic: bool = True,
                 shared_queries: bool = False):
        attn = SelfAttention(
            self.d_model, self.nhead, self.dropout, self.dtype,
            self.quantized, self.quant_static_acts,
            filter_scales(self.act_scales, "self_attn"),
            self.fast_scores, self.dropout_bits, name="self_attn",
        )(x, num_ctx, deterministic=deterministic,
          shared_queries=shared_queries)

        if self.fused_ffn and deterministic and not self.quantized:
            # Inference: residual + LN1 + FFN + residual + LN2 in one
            # Pallas VMEM pass (``ops/pallas_fused.py``). Same params,
            # same numerics; dropout layers are identity here.
            c = x.shape[-1]
            ln1_s, ln1_b = LayerNormParams(name="norm1")(c)
            w1, b1 = TorchLinear(self.dim_feedforward, dtype=self.dtype,
                                 name="linear1").weights(c)
            w2, b2 = TorchLinear(self.d_model, dtype=self.dtype,
                                 name="linear2").weights(
                                     self.dim_feedforward)
            ln2_s, ln2_b = LayerNormParams(name="norm2")(c)
            return fused_post_attention(
                x, attn, ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
                interpret=not fused_supported())

        x = x + self._drop(attn, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        x = x.astype(self.dtype)
        if self.sequence_parallel:
            x = _shard_tokens(x)

        if self.quantized:
            def dense(feats, name):
                return Int8Dense(feats, dtype=self.dtype,
                                 static_acts=self.quant_static_acts,
                                 act_scale_const=scale_for(
                                     self.act_scales, name),
                                 name=name)
        else:
            def dense(feats, name):
                return TorchLinear(feats, dtype=self.dtype, name=name)
        h = dense(self.dim_feedforward, "linear1")(x)
        h = exact_gelu(h)
        h = self._drop(h, deterministic)
        h = dense(self.d_model, "linear2")(h)
        x = x + self._drop(h, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        x = x.astype(self.dtype)
        if self.sequence_parallel:
            x = _shard_tokens(x)
        return x


class Encoder(nn.Module):
    """Stack of ``num_layers`` post-norm encoder layers.

    ``remat=True`` rematerializes each layer in the backward pass
    (``jax.checkpoint``), trading ~30% more FLOPs for O(1)-layer activation
    memory — the TPU-native lever for very large window batches."""

    d_model: int
    nhead: int
    dim_feedforward: int
    num_layers: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    quantized: bool = False
    quant_static_acts: bool = False
    act_scales: tuple = ()
    fused_ffn: bool = False
    fast_scores: bool = False
    sequence_parallel: bool = False
    dropout_bits: int = 32

    @nn.compact
    def __call__(self, x, num_ctx: int, *, deterministic: bool = True,
                 shared_queries: bool = False):
        layer_cls = EncoderLayer
        if self.remat:
            layer_cls = nn.remat(EncoderLayer, static_argnums=(2, 3, 4))
        for i in range(self.num_layers):
            x = layer_cls(
                self.d_model, self.nhead, self.dim_feedforward,
                self.dropout, self.dtype, self.quantized,
                self.quant_static_acts,
                filter_scales(self.act_scales, f"layer{i}"),
                self.fused_ffn,
                self.fast_scores,
                self.sequence_parallel,
                self.dropout_bits,
                name=f"layer{i}",
                # only layer 0 sees batch-identical query tokens
            )(x, num_ctx, deterministic, shared_queries and i == 0)
        return x
