"""VideoMAE masked-autoencoder pretraining model, TPU-native.

The reference tree ships the pretraining *data* side only
(``feature_extractors/VideoMAE/mae.py`` datasets +
``masking_generator.py``; ``datasets.py:build_pretraining_dataset``) — the
model itself lives upstream in the VideoMAE release the reference's
checkpoints come from. This implements that standard architecture
(Tong et al., NeurIPS 2022: asymmetric encoder on visible tubes, shallow
wide-token decoder, per-patch-normalized pixel MSE) so the repo can
*produce* the EPIC backbone checkpoint, not just run it.

TPU-first choices:
- every mask generator yields a FIXED masked count
  (``tim_tpu/extract/masking.py``), so visible/masked token gathers are
  static-shape ``take_along_axis`` calls and the step compiles once;
- encoder blocks/params share names with ``VideoMAEViT`` ("patch_embed",
  "block{i}"), so a pretrained encoder loads into the finetune model with
  the existing shape-matched merge.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from tim_tpu.models.backbones.vit import (
    ViTBlock, sinusoid_position_table)


class PretrainVideoMAE(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    decoder_dim: int = 512
    decoder_depth: int = 12
    decoder_heads: int = 8
    num_frames: int = 16
    tubelet_size: int = 2
    dtype: jnp.dtype = jnp.float32
    # Pallas flash attention in both trunks. The encoder's visible
    # sequence is short (~157 tokens at mask 0.9), but the decoder runs
    # the FULL 1568-token sequence for 12 layers — flash removes its
    # [B, H, S, S] score tensors from both the forward and the autodiff
    # residuals. TPU-only (no interpret fallback).
    use_flash: bool = False
    # Per-block jax.checkpoint (see ``VideoMAEViT.remat``): drops block
    # activations from autodiff residuals for larger pretrain batches.
    # Incompatible with use_flash (remat around the Pallas custom_vjp
    # crashes the TPU compiler, round 5) — use remat_mlp there.
    remat: bool = False
    # MLP-only remat (see ``ViTBlock.remat_mlp``): composes with flash.
    remat_mlp: bool = False

    @nn.compact
    def __call__(self, video, visible_idx, masked_idx):
        """video [B, T, H, W, 3]; visible_idx [B, Nv]; masked_idx [B, Nm]
        (flat tube indices). Returns reconstructions for the MASKED tubes:
        [B, Nm, tubelet * patch^2 * 3]."""
        b = video.shape[0]
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.tubelet_size, self.patch_size,
                         self.patch_size),
            strides=(self.tubelet_size, self.patch_size, self.patch_size),
            padding="VALID", dtype=self.dtype, param_dtype=jnp.float32,
            name="patch_embed")(video.astype(self.dtype))
        x = x.reshape(b, -1, self.embed_dim)
        n = x.shape[1]

        pos = jnp.asarray(sinusoid_position_table(n, self.embed_dim),
                          self.dtype)
        x = x + pos[None]

        block_cls = nn.remat(ViTBlock) if self.remat else ViTBlock
        xv = jnp.take_along_axis(x, visible_idx[..., None], axis=1)
        for i in range(self.depth):
            xv = block_cls(self.embed_dim, self.num_heads, self.mlp_ratio,
                           dtype=self.dtype, use_flash=self.use_flash,
                           remat_mlp=self.remat_mlp,
                           name=f"block{i}")(xv)
        xv = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                          name="encoder_norm")(xv).astype(self.dtype)
        xv = nn.Dense(self.decoder_dim, use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32,
                      kernel_init=nn.initializers.truncated_normal(0.02),
                      name="encoder_to_decoder")(xv)

        dpos = jnp.asarray(sinusoid_position_table(n, self.decoder_dim),
                           self.dtype)
        dpos_b = jnp.broadcast_to(dpos[None], (b, n, self.decoder_dim))
        pos_vis = jnp.take_along_axis(dpos_b, visible_idx[..., None], axis=1)
        pos_msk = jnp.take_along_axis(dpos_b, masked_idx[..., None], axis=1)

        mask_token = self.param(
            "mask_token", nn.initializers.truncated_normal(0.02),
            (1, 1, self.decoder_dim), jnp.float32).astype(self.dtype)
        d = jnp.concatenate(
            [xv + pos_vis, mask_token + pos_msk], axis=1)
        for i in range(self.decoder_depth):
            d = block_cls(self.decoder_dim, self.decoder_heads,
                          self.mlp_ratio, dtype=self.dtype,
                          use_flash=self.use_flash,
                          remat_mlp=self.remat_mlp,
                          name=f"decoder_block{i}")(d)
        d = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         name="decoder_norm")(d).astype(self.dtype)
        out = nn.Dense(self.tubelet_size * self.patch_size ** 2 * 3,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=nn.initializers.truncated_normal(0.02),
                       name="decoder_head")(d[:, -masked_idx.shape[1]:])
        return out

    @property
    def grid(self):
        s = self.img_size // self.patch_size
        return (self.num_frames // self.tubelet_size, s, s)


def patchify(video: jnp.ndarray, tubelet: int, patch: int) -> jnp.ndarray:
    """[B, T, H, W, 3] -> [B, N, tubelet*patch*patch, 3], tubes ordered
    t-major then row-major spatially — the same order the Conv patch embed
    flattens to (VideoMAE's ``b c (t p0) (h p1) (w p2) -> b (t h w)
    (p0 p1 p2) c`` rearrange)."""
    b, t, h, w, c = video.shape
    tt, hh, ww = t // tubelet, h // patch, w // patch
    x = video.reshape(b, tt, tubelet, hh, patch, ww, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, tt * hh * ww, tubelet * patch * patch, c)


def pretrain_targets(video: jnp.ndarray, masked_idx: jnp.ndarray,
                     tubelet: int, patch: int,
                     normalize: bool = True) -> jnp.ndarray:
    """Per-patch-normalized pixel targets at the masked tubes (VideoMAE's
    ``normlize_target=True``: mean/unbiased-std over the positions within
    each tube, per channel)."""
    patches = patchify(video.astype(jnp.float32), tubelet, patch)
    if normalize:
        mean = patches.mean(axis=-2, keepdims=True)
        k = patches.shape[-2]
        var = ((patches - mean) ** 2).sum(axis=-2, keepdims=True) / (k - 1)
        patches = (patches - mean) / (jnp.sqrt(var) + 1e-6)
    b, n = patches.shape[:2]
    flat = patches.reshape(b, n, -1)
    return jnp.take_along_axis(flat, masked_idx[..., None], axis=1)


def pretrain_loss(pred: jnp.ndarray, video: jnp.ndarray,
                  masked_idx: jnp.ndarray, tubelet: int, patch: int,
                  normalize: bool = True) -> jnp.ndarray:
    """MSE over masked-tube reconstructions."""
    labels = pretrain_targets(video, masked_idx, tubelet, patch, normalize)
    return jnp.mean((pred.astype(jnp.float32) - labels) ** 2)
